"""
Layer tests (SURVEY.md §4): numerical oracles, shape/param checks, RNG
reproducibility. The LocallyConnected oracle is a direct numpy computation of
the unshared-weight convolution.
"""

import itertools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne
from neurite_tpu import layers as L

K0 = jax.random.PRNGKey(0)
K1 = jax.random.PRNGKey(1)


def init_apply(layer, x, rngs=None, **kwargs):
    variables = layer.init({'params': K0, **(rngs or {})}, x, **kwargs)
    out = layer.apply(variables, x, rngs=rngs, **kwargs)
    return variables, out


class TestBasicLayers:
    def test_negate(self):
        x = jnp.asarray([1.0, -2.0])
        _, y = init_apply(L.Negate(), x)
        np.testing.assert_allclose(y, [-1.0, 2.0])

    def test_rescale_values(self):
        x = jnp.asarray([1.0, 2.0])
        _, y = init_apply(L.RescaleValues(resize=0.5), x)
        np.testing.assert_allclose(y, [0.5, 1.0])

    def test_resize_layer(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 8, 8, 1)).astype(np.float32))
        _, y = init_apply(L.Resize(zoom_factor=2), x)
        assert y.shape == (2, 16, 16, 1)
        # batch items resized independently == vmap of op
        want = jax.vmap(lambda v: ne.utils.resize(v, [2, 2]))(x)
        np.testing.assert_allclose(y, want, rtol=1e-6)

    def test_soft_quantize_layer_is_negated(self):
        x = jnp.asarray([[0.0, 1.0]])
        _, y = init_apply(L.SoftQuantize(nb_bins=4), x)
        want = -ne.utils.soft_quantize(x, nb_bins=4)
        np.testing.assert_allclose(y, want, rtol=1e-6)

    def test_mse_layer(self):
        a = jnp.ones((2, 3, 4))
        b = jnp.zeros((2, 3, 4))
        _, y = init_apply(L.MSE(), [a, b])
        np.testing.assert_allclose(y, [1.0, 1.0])

    def test_fft_layers_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 8, 8, 1)).astype(np.float32))
        _, f = init_apply(L.FFT(), x)
        _, back = init_apply(L.IFFT(), f)
        np.testing.assert_allclose(jnp.real(back), x, rtol=1e-4, atol=1e-5)

    def test_fftshift_layer(self):
        x = jnp.asarray(np.arange(8, dtype=np.float32)).reshape(1, 8, 1)
        _, y = init_apply(L.FFTShift(), x)
        np.testing.assert_allclose(y[0, :, 0],
                                   np.fft.fftshift(np.arange(8)))

    def test_complex_channels_layers(self):
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(1, 4, 4)).astype(np.float32))
        _, c = init_apply(L.ChannelsToComplex(), x)
        _, back = init_apply(L.ComplexToChannels(), c)
        np.testing.assert_allclose(back, x, rtol=1e-6)


class TestRandomLayers:
    def test_gaussian_blur_fixed_matches_op(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 16, 16, 1)).astype(np.float32))
        _, y = init_apply(L.GaussianBlur(sigma=1.5), x)
        ks = ne.utils.gaussian_kernel([1.5, 1.5], separate=True)
        want = ne.utils.separable_conv(x, ks, batched=True)
        np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)

    def test_gaussian_blur_zero_sigma_identity(self):
        x = jnp.ones((1, 8, 8, 1))
        _, y = init_apply(L.GaussianBlur(sigma=0), x)
        np.testing.assert_allclose(y, x)

    def test_gaussian_blur_random_reproducible(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 16, 16, 1)).astype(np.float32))
        layer = L.GaussianBlur(sigma=3.0, random=True, min_sigma=0.5)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y1 = layer.apply(v, x, rngs={'augment': K1})
        y2 = layer.apply(v, x, rngs={'augment': K1})
        y3 = layer.apply(v, x, rngs={'augment': jax.random.PRNGKey(7)})
        np.testing.assert_allclose(y1, y2)
        assert not np.allclose(y1, y3)

    def test_subsample_layer_shape(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 16, 16, 1)).astype(np.float32))
        layer = L.Subsample(stride_min=2, stride_max=4)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = layer.apply(v, x, rngs={'augment': K1})
        assert y.shape == x.shape
        assert not np.allclose(y, x)

    def test_random_crop_zeroes_a_band(self):
        x = jnp.ones((1, 16, 16, 1))
        layer = L.RandomCrop(crop_min=0.3, crop_max=0.5)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        assert 0 < (y == 0).mean() < 1

    def test_random_clip(self):
        x = jnp.asarray(np.linspace(-3, 3, 100, dtype=np.float32))[None]
        layer = L.RandomClip(clip_min=(-1.5, -1.0), clip_max=(1.0, 1.5))
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        assert y.min() >= -1.5 and y.max() <= 1.5
        assert y.min() <= -1.0 + 1e-6 and y.max() >= 1.0 - 1e-6

    def test_sample_normal_logvar(self):
        mu = jnp.full((1, 1000), 2.0)
        log_var = jnp.full((1, 1000), np.log(0.25).astype(np.float32))
        layer = L.SampleNormalLogVar()
        v = layer.init({'params': K0, 'sample': K1}, [mu, log_var])
        z = np.asarray(layer.apply(v, [mu, log_var], rngs={'sample': K1}))
        assert abs(z.mean() - 2.0) < 0.1
        assert abs(z.std() - 0.5) < 0.05

    def test_gaussian_noise_absolute(self):
        x = jnp.zeros((2, 1000, 1))
        layer = L.GaussianNoise(noise_min=0.5, noise_max=0.50001,
                                absolute=True)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        assert abs(y.std() - 0.5) < 0.1

    def test_gaussian_noise_complex(self):
        x = jnp.zeros((1, 64, 2), jnp.complex64)
        layer = L.GaussianNoise(noise_min=0.1, noise_max=0.2, absolute=True)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = layer.apply(v, x, rngs={'augment': K1})
        assert jnp.iscomplexobj(y)

    def test_gaussian_noise_only(self):
        x = jnp.full((1, 100, 1), 7.0)
        layer = L.GaussianNoise(noise_min=0.01, noise_max=0.05,
                                noise_only=True, absolute=True)
        v = layer.init({'params': K0, 'augment': K1}, x)
        y = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        assert abs(y.mean()) < 1.0  # noise, not x+noise

    def test_perlin_noise_layer(self):
        x = jnp.zeros((2, 16, 16, 1))
        layer = L.PerlinNoise(fwhm_min=[2, 4], fwhm_max=[4, 8])
        v = layer.init({'params': K0, 'augment': K1}, x)
        y1 = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        y2 = np.asarray(layer.apply(v, x, rngs={'augment': K1}))
        assert y1.shape == (2, 16, 16, 1)
        np.testing.assert_allclose(y1, y2)  # reproducible
        assert not np.allclose(y1[0], y1[1])  # items differ


def np_locally_connected(x, kernel, bias, kernel_size, strides, filters):
    """numpy oracle for valid-padding unshared conv (keras LC semantics)."""
    b = x.shape[0]
    ndims = len(kernel_size)
    in_ch = x.shape[-1]
    out_shape = [(x.shape[1 + d] - kernel_size[d]) // strides[d] + 1
                 for d in range(ndims)]
    out = np.zeros((b, *out_shape, filters), np.float32)
    for pos_idx, pos in enumerate(itertools.product(*[range(s) for s in out_shape])):
        sl = tuple(slice(pos[d] * strides[d], pos[d] * strides[d] + kernel_size[d])
                   for d in range(ndims))
        patch = x[(slice(None), *sl, slice(None))].reshape(b, -1)  # [B, K*C]
        out[(slice(None), *pos, slice(None))] = patch @ kernel[pos_idx]
    if bias is not None:
        out = out + bias[None]
    return out


class TestLocallyConnected:
    @pytest.mark.parametrize('rank', [1, 2, 3])
    def test_matches_numpy_oracle(self, rank):
        rng = np.random.default_rng(0)
        spatial = (8, 7, 6)[:rank]
        x = jnp.asarray(rng.normal(size=(2, *spatial, 3)).astype(np.float32))
        layer = L.LocallyConnected(filters=4, kernel_size=3, rank=rank)
        v = layer.init(K0, x)
        y = np.asarray(layer.apply(v, x))

        # filters=4 routes the keras-layout einsum path under 'auto' (r4:
        # transposed storage is single-filter-only); oracle layout matches
        kernel = np.asarray(v['params']['kernel'])
        bias = np.asarray(v['params']['bias'])
        ks = (3,) * rank
        st = (1,) * rank
        want = np_locally_connected(np.asarray(x), kernel,
                                    bias.reshape(*bias.shape), ks, st, 4)
        np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-5)

    def test_param_count_formula(self):
        # (30*30*30)*(3*3*3*64) params + (30*30*30)*64 bias for 32^3 inputs
        # with 3 channels is huge; use a small case but same formula
        # (ref layers.py:831-832)
        x = jnp.zeros((1, 6, 6, 6, 2))
        layer = L.LocallyConnected3D(filters=5, kernel_size=3)
        v = layer.init(K0, x)
        out_vox = 4 * 4 * 4
        # same parameter COUNT as the reference formula; filters=5 keeps
        # the keras layout [V, K*C, O] under 'auto' (r4: transposed
        # storage is single-filter-only)
        assert v['params']['kernel'].shape == (out_vox, 27 * 2, 5)
        assert v['params']['bias'].shape == (4, 4, 4, 5)

    def test_strides(self):
        x = jnp.zeros((1, 9, 9, 1))
        layer = L.LocallyConnected2D(filters=2, kernel_size=3, strides=2)
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        assert y.shape == (1, 4, 4, 2)

    def test_same_padding(self):
        x = jnp.zeros((1, 8, 8, 1))
        layer = L.LocallyConnected2D(filters=2, kernel_size=3, padding='same')
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        assert y.shape == (1, 8, 8, 2)

    def test_layout_converters_round_trip(self):
        """keras_to_transposed / transposed_to_keras are inverse bijections
        and map reference-layout weights onto the layer's storage."""
        from neurite_tpu.ops import lc_tap
        rng = np.random.default_rng(7)
        keras_k = jnp.asarray(rng.normal(size=(4 ** 3, 27 * 2, 3)),
                              jnp.float32)
        t = lc_tap.keras_to_transposed(keras_k)
        assert t.shape == (3, 27 * 2, 4 ** 3)
        np.testing.assert_array_equal(np.asarray(
            lc_tap.transposed_to_keras(t)), np.asarray(keras_k))

        # imported weights behave identically to the numpy keras oracle
        # (kernel_layout pinned: 'auto' keeps keras storage at filters>1)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 2)).astype(np.float32))
        layer = L.LocallyConnected3D(filters=3, kernel_size=3,
                                     use_bias=False,
                                     kernel_layout='transposed')
        y = np.asarray(layer.apply({'params': {'kernel': t}}, x))
        want = np_locally_connected(np.asarray(x), np.asarray(keras_k),
                                    None, (3, 3, 3), (1, 1, 1), 3)
        np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-5)

    def test_matches_shared_conv_when_weights_tied(self):
        """If all positions share the same weights, LC == regular conv."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
        layer = L.LocallyConnected2D(filters=3, kernel_size=3, use_bias=False)
        v = layer.init(K0, x)
        k = np.asarray(v['params']['kernel'])       # keras [V, K*C, O] (r4:
        k_tied = np.broadcast_to(k[:1], k.shape)    # filters>1 routes keras)
        v = {'params': {'kernel': jnp.asarray(k_tied)}}
        y = np.asarray(layer.apply(v, x))
        # oracle: correlate with the single kernel reshaped [3,3,2,3]
        kmat = k_tied[0].reshape(3, 3, 2, 3)
        want = jax.lax.conv_general_dilated(
            x, jnp.asarray(kmat), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(y, np.asarray(want), rtol=2e-4, atol=2e-5)


class TestLocalLayers:
    def test_local_bias(self):
        x = jnp.ones((2, 4, 4, 1))
        layer = L.LocalBias(biasmult=2.0)
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        want = x + v['params']['kernel'] * 2.0
        np.testing.assert_allclose(y, want)

    def test_local_linear(self):
        x = jnp.ones((2, 4, 1))
        layer = L.LocalLinear()
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        want = x * v['params']['mult'] + v['params']['bias']
        np.testing.assert_allclose(y, want)

    def test_local_param(self):
        layer = L.LocalParamLayer(shape=(4, 4), mult=3.0)
        v = layer.init(K0, jnp.zeros((5, 1)))
        y = layer.apply(v, jnp.zeros((5, 1)))
        assert y.shape == (5, 4, 4)
        np.testing.assert_allclose(y[0], v['params']['kernel'] * 3.0)
        np.testing.assert_allclose(y[0], y[4])

    def test_local_cross_linear(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
        layer = L.LocalCrossLinear(output_features=5)
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        assert y.shape == (2, 4, 4, 5)
        mult = np.asarray(v['params']['mult'])[0]
        bias = np.asarray(v['params']['bias'])
        want = np.einsum('bxyi,xyio->bxyo', np.asarray(x), mult) + bias
        np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)

    def test_local_cross_linear_trf(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
        layer = L.LocalCrossLinearTrf(output_features=3)
        v = layer.init(K0, x)
        y = layer.apply(v, x)
        assert y.shape == (1, 6, 6, 3)
        assert np.isfinite(np.asarray(y)).all()


class TestSparseDense:
    def test_decode_shape(self):
        layer = L.SpatiallySparse_Dense(input_shape=(6, 6), output_len=4)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(3, 4)).astype(np.float32))
        v = layer.init(K0, [x])
        y = layer.apply(v, [x])
        assert y.shape == (3, 6, 6)

    def test_encode_decode_consistency(self):
        """With a full observation mask, encode(decode(z)) ≈ z."""
        rng = np.random.default_rng(1)
        layer = L.SpatiallySparse_Dense(input_shape=(8, 8), output_len=5)
        z = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
        v = layer.init(K0, [z])
        vol = layer.apply(v, [z])  # decode: [2, 8, 8]
        mask = jnp.ones((2, 8, 8))
        z_back = layer.apply(v, [vol, mask])  # encode with full mask
        np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                                   rtol=1e-2, atol=1e-3)

    def test_encode_partial_mask(self):
        rng = np.random.default_rng(2)
        layer = L.SpatiallySparse_Dense(input_shape=(8, 8), output_len=3)
        y = jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32))
        mask = jnp.asarray((rng.uniform(size=(2, 8, 8)) > 0.3).astype(np.float32))
        v = layer.init(K0, [y, mask])
        z = layer.apply(v, [y, mask])
        assert z.shape == (2, 3)
        assert np.isfinite(np.asarray(z)).all()

    def test_encode_chunked_matches_oneshot(self, monkeypatch):
        """The volume-scale chunked-scan normal equations (no [N, D, d]
        materialization) must match the one-shot masked-Wo graph exactly —
        values AND gradients (layers/sparse.py encode path)."""
        from neurite_tpu.layers import sparse as sparse_mod
        rng = np.random.default_rng(3)
        layer = L.SpatiallySparse_Dense(input_shape=(8, 16), output_len=6)
        y = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
        mask = jnp.asarray(
            (rng.uniform(size=(2, 8, 16)) > 0.4).astype(np.float32))
        v = layer.init(K0, [y, mask])

        def enc_loss(vv, yy):
            return jnp.sum(layer.apply(vv, [yy, mask]) ** 2)

        z0 = layer.apply(v, [y, mask])
        g0 = jax.grad(enc_loss, argnums=(0, 1))(v, y)
        monkeypatch.setattr(sparse_mod, '_ENCODE_CHUNK_ELEMS', 64)
        z1 = layer.apply(v, [y, mask])
        g1 = jax.grad(enc_loss, argnums=(0, 1))(v, y)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


class TestStreamLayers:
    def test_mean_stream_updates(self):
        layer = L.MeanStream(cap=100)
        x1 = jnp.ones((4, 3)) * 2.0
        v = layer.init(K0, x1, training=True)
        out, updates = layer.apply(v, x1, training=True,
                                   mutable=['stream_stats'])
        stats = updates['stream_stats']
        np.testing.assert_allclose(stats['count'], [4.0])
        np.testing.assert_allclose(stats['mean'], np.full(3, 2.0), rtol=1e-6)
        # output scaled by min(1, count/cap) = 0.04
        np.testing.assert_allclose(out, np.full((4, 3), 2.0 * 4 / 100),
                                   rtol=1e-6)

    def test_mean_stream_converges(self):
        layer = L.MeanStream(cap=8)
        rng = np.random.default_rng(0)
        v = layer.init(K0, jnp.zeros((4, 2)), training=True)
        stats = v
        for i in range(20):
            x = jnp.asarray(rng.normal(3.0, 0.1, size=(4, 2)).astype(np.float32))
            out, updates = layer.apply(stats, x, training=True,
                                       mutable=['stream_stats'])
            stats = {'stream_stats': updates['stream_stats']}
        mean = np.asarray(updates['stream_stats']['mean'])
        np.testing.assert_allclose(mean, np.full(2, 3.0), atol=0.2)
        # inference mode returns stored stats
        out = layer.apply(stats, jnp.zeros((2, 2)), training=False)
        np.testing.assert_allclose(out[0], mean, rtol=1e-6)

    def test_cov_stream_shape(self):
        layer = L.CovStream(cap=10)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 2, 3)).astype(np.float32))
        v = layer.init(K0, x, training=True)
        out, updates = layer.apply(v, x, training=True,
                                   mutable=['stream_stats'])
        assert out.shape == (4, 6, 6)
        assert updates['stream_stats']['cov'].shape == (6, 6)


class TestHyperLayers:
    def test_hyper_conv_matches_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 3, 3, 3, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
        layer = L.HyperConv(filters=4, kernel_size=3, rank=2)
        v = layer.init(K0, [x, k, b])
        y = np.asarray(layer.apply(v, [x, k, b]))
        for i in range(2):
            want = jax.lax.conv_general_dilated(
                x[i:i + 1], k[i], (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b[i]
            np.testing.assert_allclose(y[i], np.asarray(want)[0], rtol=2e-4,
                                       atol=2e-5)

    def test_hyper_conv_from_dense(self):
        x = jnp.zeros((2, 8, 8, 8, 1))
        h = jnp.ones((2, 16))
        layer = L.HyperConv3DFromDense(filters=4, kernel_size=3,
                                       padding='same')
        v = layer.init(K0, [x, h])
        y = layer.apply(v, [x, h])
        assert y.shape == (2, 8, 8, 8, 4)

    def test_hyper_dense(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 5, 7)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 7)).astype(np.float32))
        layer = L.HyperDense(units=7)
        v = layer.init(K0, [x, k, b])
        y = np.asarray(layer.apply(v, [x, k, b]))
        want = np.einsum('bi,bio->bo', np.asarray(x), np.asarray(k)) + b
        np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)

    def test_hyper_dense_from_dense(self):
        x = jnp.ones((3, 6))
        h = jnp.ones((3, 4))
        layer = L.HyperDenseFromDense(units=5, activation='relu')
        v = layer.init(K0, [x, h])
        y = layer.apply(v, [x, h])
        assert y.shape == (3, 5)
        assert (np.asarray(y) >= 0).all()


class TestTransformOps:
    def test_zero_shift_identity(self):
        vol = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 8)).astype(np.float32))
        shift = jnp.zeros((8, 8, 2))
        out = ne.utils.transform(vol, shift)
        np.testing.assert_allclose(out, vol, rtol=1e-5, atol=1e-5)

    def test_integer_shift(self):
        vol = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8))
        shift = jnp.ones((8, 8, 2))
        out = np.asarray(ne.utils.transform(vol, shift))
        want = np.asarray(vol)
        # out(x) = vol(x+1) for interior
        np.testing.assert_allclose(out[:7, :7], want[1:, 1:], rtol=1e-5)

    def test_affine_to_dense_identity(self):
        mat = jnp.eye(2, 3)
        shift = ne.utils.affine_to_dense_shift(mat, (6, 6))
        np.testing.assert_allclose(shift, np.zeros((6, 6, 2)), atol=1e-6)

    def test_affine_translation(self):
        mat = jnp.asarray([[1.0, 0, 2.0], [0, 1.0, -1.0]])
        shift = np.asarray(ne.utils.affine_to_dense_shift(mat, (6, 6)))
        np.testing.assert_allclose(shift[..., 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(shift[..., 1], -1.0, atol=1e-5)

    def test_integrate_vec_zero(self):
        vec = jnp.zeros((8, 8, 2))
        out = ne.utils.integrate_vec(vec)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_integrate_vec_constant_translation(self):
        # constant velocity field integrates to (approximately) itself
        vec = jnp.full((16, 16, 2), 0.5)
        out = np.asarray(ne.utils.integrate_vec(vec, nb_steps=6))
        np.testing.assert_allclose(out[4:-4, 4:-4], 0.5, atol=1e-3)

    def test_compose_affine_and_dense(self):
        mat = jnp.asarray([[1.0, 0, 1.0], [0, 1.0, 0.0]])  # +1 in x
        dense = jnp.zeros((8, 8, 2)).at[..., 1].set(1.0)   # +1 in y
        comp = np.asarray(ne.utils.compose_transforms([mat, dense],
                                                      shape=(8, 8)))
        np.testing.assert_allclose(comp[..., 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(comp[..., 1], 1.0, atol=1e-4)

    def test_params_to_affine_identity(self):
        mat = np.asarray(ne.utils.params_to_affine_matrix(ndims=3))
        np.testing.assert_allclose(mat, np.eye(3, 4), atol=1e-6)

    def test_params_to_affine_rotation_90(self):
        mat = np.asarray(ne.utils.params_to_affine_matrix(
            rotation=[90.0], ndims=2))
        want = np.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
        np.testing.assert_allclose(mat, want, atol=1e-6)

    def test_draw_affine_params_bounds(self):
        par = np.asarray(ne.utils.draw_affine_params(
            K1, shift=10, rot=30, scale=0.2, shear=0.1, ndims=3))
        assert par.shape == (12,)
        assert (np.abs(par[:3]) <= 10).all()
        assert (np.abs(par[3:6]) <= 30).all()
        assert (np.abs(par[6:9] - 1) <= 0.2).all()
        assert (np.abs(par[9:]) <= 0.1).all()

    def test_rescale_dense_transform(self):
        field = jnp.ones((4, 4, 2))
        out = ne.utils.rescale_dense_transform(field, 2)
        assert out.shape == (8, 8, 2)
        np.testing.assert_allclose(out, 2.0, rtol=1e-5)


class TestLocallyConnectedPallasWiring:
    """Layer-level parity of the NEURITE_PALLAS_LC path (interpret mode)."""

    def test_pallas_path_matches_default(self, monkeypatch):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32))
        layer = L.LocallyConnected3D(filters=1, kernel_size=3, padding='same')
        v = layer.init(K0, x)
        want = np.asarray(layer.apply(v, x))
        monkeypatch.setenv('NEURITE_PALLAS_LC', 'interpret')
        got = np.asarray(layer.apply(v, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_pallas_path_gradients_match(self, monkeypatch):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 2)).astype(np.float32))
        layer = L.LocallyConnected3D(filters=1, kernel_size=3, padding='same')
        v = layer.init(K0, x)

        def loss(v, x):
            return jnp.sum(layer.apply(v, x) ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(v, x)
        monkeypatch.setenv('NEURITE_PALLAS_LC', 'interpret')
        pw, px = jax.grad(loss, argnums=(0, 1))(v, x)
        np.testing.assert_allclose(np.asarray(px), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(pw), jax.tree.leaves(gw)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_unsupported_shapes_fall_back(self, monkeypatch):
        # filters=2 not supported by the kernel: must route to XLA silently
        monkeypatch.setenv('NEURITE_PALLAS_LC', 'interpret')
        x = jnp.zeros((1, 4, 4, 4, 2))
        layer = L.LocallyConnected3D(filters=2, kernel_size=3, padding='same')
        v = layer.init(K0, x)
        assert layer.apply(v, x).shape == (1, 4, 4, 4, 2)

    def test_flag_on_cpu_backend_falls_back(self, monkeypatch):
        # '1' requires a TPU backend; on CPU it must silently take XLA
        monkeypatch.setenv('NEURITE_PALLAS_LC', '1')
        x = jnp.ones((1, 4, 4, 4, 2))
        layer = L.LocallyConnected3D(filters=1, kernel_size=3, padding='same')
        v = layer.init(K0, x)
        assert layer.apply(v, x).shape == (1, 4, 4, 4, 1)

    def test_pallas_batch_grad_matches(self, monkeypatch):
        # B>1 exercises the f32 batch accumulation of dk (ADVICE r3)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(3, 4, 8, 8, 2)).astype(np.float32))
        layer = L.LocallyConnected3D(filters=1, kernel_size=3, padding='same')
        v = layer.init(K0, x)

        def loss(v, x):
            return jnp.sum(layer.apply(v, x) ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(v, x)
        monkeypatch.setenv('NEURITE_PALLAS_LC', 'interpret')
        pw, px = jax.grad(loss, argnums=(0, 1))(v, x)
        np.testing.assert_allclose(np.asarray(px), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(pw), jax.tree.leaves(gw)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestLocallyConnectedKernelLayout:
    """Explicit kernel_layout pinning (ADVICE r3: the auto heuristic's
    shape switch must be overridable)."""

    def _apply(self, layout, x, key):
        layer = L.LocallyConnected3D(filters=1, kernel_size=3,
                                     padding='same', kernel_layout=layout)
        v = layer.init(key, x)
        return layer, v

    def test_layout_shapes(self):
        x = jnp.zeros((1, 4, 6, 6, 2))
        _, vk = self._apply('keras', x, K0)
        _, vt = self._apply('transposed', x, K0)
        V, TC = 4 * 6 * 6, 27 * 2
        assert vk['params']['kernel'].shape == (V, TC, 1)
        assert vt['params']['kernel'].shape == (1, TC, V)
        # auto picks transposed here (filters=1, Cin=2 <= 64, stride 1)
        _, va = self._apply('auto', x, K0)
        assert va['params']['kernel'].shape == (1, TC, V)

    def test_layouts_agree_after_conversion(self):
        from neurite_tpu.ops import lc_tap
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 2)).astype(np.float32))
        lk, vk = self._apply('keras', x, K0)
        want = np.asarray(lk.apply(vk, x))
        lt, _ = self._apply('transposed', x, K0)
        vt = {'params': {
            'kernel': lc_tap.keras_to_transposed(vk['params']['kernel']),
            'bias': vk['params']['bias']}}
        got = np.asarray(lt.apply(vt, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_transposed_rejects_strides(self):
        x = jnp.zeros((1, 4, 6, 6, 2))
        layer = L.LocallyConnected3D(filters=1, kernel_size=3, strides=2,
                                     padding='same',
                                     kernel_layout='transposed')
        with np.testing.assert_raises(AssertionError):
            layer.init(K0, x)
