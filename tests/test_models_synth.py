"""
Tests for AE/classifier builders and the synthesis pipelines
(SURVEY.md §4 item 4: golden reproducibility with fixed PRNG keys).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne

K0 = jax.random.PRNGKey(0)
K1 = jax.random.PRNGKey(1)


def _labels(batch=2, size=16, nb=4, ndims=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, nb, size=(batch, *(size,) * ndims, 1)), jnp.int32)


class TestAE:
    def test_conv_ae_shapes(self):
        model = ne.models.ae(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2,
                             enc_size=(4, 4, 3), ae_type='conv')
        x = jnp.zeros((1, 16, 16, 1))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (1, 16, 16, 2)

    def test_dense_ae_shapes(self):
        model = ne.models.ae(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2,
                             enc_size=(10,), ae_type='dense')
        x = jnp.zeros((1, 16, 16, 1))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (1, 16, 16, 2)

    def test_vae_sows_mu_sigma(self):
        model = ne.models.ae(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2,
                             enc_size=(8,), ae_type='dense', do_vae=True)
        x = jnp.zeros((2, 16, 16, 1))
        v = model.init({'params': K0, 'sample': K1}, x)
        y, inter = model.apply(v, x, rngs={'sample': K1},
                               mutable=['intermediates'])
        mids = inter['intermediates']['mid']
        assert 'ae_mu' in mids and 'ae_sigma' in mids and 'ae_sample' in mids
        assert mids['ae_mu'][0].shape == (2, 8)

    def test_ae_return_parts(self):
        model = ne.models.ae(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2,
                             enc_size=(6,), ae_type='dense')
        x = jnp.zeros((1, 16, 16, 1))
        v = model.init(K0, x)
        out, mid, enc = model.apply(v, x, return_parts=True)
        assert enc.shape == (1, 8, 8, 4)
        assert mid.shape == enc.shape
        assert out.shape == (1, 16, 16, 2)

    def test_single_ae_conv_resize(self):
        model = ne.models.single_ae(enc_size=(4, 4, 3),
                                    input_shape=(8, 8, 2), ae_type='conv',
                                    conv_size=3, batch_norm=None)
        x = jnp.zeros((1, 8, 8, 2))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (1, 8, 8, 2)


class TestClassifiers:
    @pytest.mark.parametrize('final_layer,out_shape', [
        ('dense-sigmoid', (2, 1)), ('dense-tanh', (2, 1)),
        ('dense-softmax', (2, 3))])
    def test_design_dnn(self, final_layer, out_shape):
        model = ne.models.design_dnn(nb_features=4, input_shape=(16, 16),
                                     nb_levels=2, conv_size=3, nb_labels=3,
                                     final_layer=final_layer)
        x = jnp.zeros((2, 16, 16, 1))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == out_shape

    def test_encoder_net_classifier(self):
        model = ne.models.EncoderNet(nb_features=4, input_shape=(16, 16, 1),
                                     nb_levels=2, conv_size=3, nb_labels=3)
        x = jnp.zeros((2, 16, 16, 1))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)

    def test_encoder_net_regression(self):
        model = ne.models.EncoderNet(nb_features=4, input_shape=(16, 16, 1),
                                     nb_levels=2, conv_size=3, nb_labels=0)
        x = jnp.zeros((2, 16, 16, 1))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (2, 1)

    def test_dense_layer_net(self):
        model = ne.models.DenseLayerNet(inshape=(10,), layer_sizes=[16, 8],
                                        nb_labels=3)
        x = jnp.zeros((4, 10))
        v = model.init(K0, x)
        y = model.apply(v, x)
        assert y.shape == (4, 3)


class TestLabelsToImageNew:
    def _build(self, **kwargs):
        return ne.models.labels_to_image_new(
            labels_in=list(range(4)), in_shape=(16, 16),
            warp_blur_min=(4, 4), warp_blur_max=(8, 8), **kwargs)

    def test_shapes_and_range(self):
        model = self._build()
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        assert out['image'].shape == (2, 16, 16, 1)
        assert out['map'].shape == (2, 16, 16, 4)
        img = np.asarray(out['image'])
        assert img.min() >= -1e-5 and img.max() <= 1.2  # normalized + gamma

    def test_reproducible_with_fixed_key(self):
        model = self._build()
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        o1 = model.apply(v, labels, rngs={'augment': K1})
        o2 = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_array_equal(np.asarray(o1['image']),
                                      np.asarray(o2['image']))
        o3 = model.apply(v, labels, rngs={'augment': jax.random.PRNGKey(9)})
        assert not np.allclose(np.asarray(o1['image']),
                               np.asarray(o3['image']))

    def test_seed_pinning_synchronizes_components(self):
        """Pinning 'warp' must make the velocity field identical across keys."""
        model = self._build(return_vel=True, seeds={'warp': 42})
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        o1 = model.apply(v, labels, rngs={'augment': K1})
        o2 = model.apply(v, labels, rngs={'augment': jax.random.PRNGKey(5)})
        np.testing.assert_array_equal(np.asarray(o1['vel']),
                                      np.asarray(o2['vel']))
        assert not np.allclose(np.asarray(o1['image']),
                               np.asarray(o2['image']))

    def test_unknown_seed_raises(self):
        model = self._build(seeds={'nope': 1})
        labels = _labels()
        with pytest.raises(AssertionError, match='unknown seeds'):
            model.init({'params': K0, 'augment': K1}, labels)

    def test_extra_returns(self):
        model = self._build(return_vel=True, return_def=True, return_aff=True,
                            return_mean=True, return_bias=True,
                            aff_shift=2, aff_rotate=5)
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        assert out['aff'].shape == (2, 3, 3)
        assert out['vel'].shape == (2, 8, 8, 2)
        assert out['def'].shape == (2, 16, 16, 2)
        assert out['mean'].shape == (2, 1, 4)
        assert out['bias'].shape == (2, 16, 16, 1)

    def test_labels_out_subset_one_hot(self):
        model = self._build(labels_out={1: 1, 2: 2})
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        # only labels 1, 2 one-hot encoded
        assert out['map'].shape[-1] == 2

    def test_out_shape_crop(self):
        model = self._build(out_shape=(8, 8))
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        assert out['image'].shape == (2, 8, 8, 1)
        assert out['map'].shape == (2, 8, 8, 4)

    def test_map_is_valid_one_hot(self):
        model = self._build()
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        m = np.asarray(out['map'])
        assert ((m == 0) | (m == 1)).all()

    def test_jittable(self):
        model = self._build()
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        f = jax.jit(lambda l, k: model.apply(v, l, rngs={'augment': k}))
        out = f(labels, K1)
        assert np.isfinite(np.asarray(out['image'])).all()


class TestLabelsToImageV1:
    def test_shapes(self):
        model = ne.models.labels_to_image(
            in_shape=(16, 16), in_label_list=list(range(4)))
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        assert out['image'].shape == (2, 16, 16, 1)
        assert out['map'].shape == (2, 16, 16, 4)

    def test_no_warp(self):
        model = ne.models.labels_to_image(
            in_shape=(16, 16), in_label_list=list(range(3)), warp_std=0)
        labels = _labels(nb=3)
        v = model.init({'params': K0, 'augment': K1}, labels)
        out = model.apply(v, labels, rngs={'augment': K1})
        # labels unchanged when no warp: argmax(one_hot) == input labels
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out['map'], -1)),
            np.asarray(labels)[..., 0])


class TestSynthStrip:
    def test_forward(self):
        model = ne.models.SynthStrip(
            inshape=(16, 16), labels_in=list(range(4)), labels_out=[1],
            nb_unet_features=4, nb_unet_levels=2)
        labels = _labels()
        v = model.init({'params': K0, 'augment': K1}, labels)
        y = model.apply(v, labels, rngs={'augment': K1})
        # concat(unet prob, synth labels)
        assert y.shape == (2, 16, 16, 2)


class TestLabelsToImage3DOneHotWarp:
    def _build(self, **kwargs):
        return ne.models.labels_to_image_new(
            labels_in=list(range(4)), in_shape=(16, 16, 16),
            warp_blur_min=(4, 4, 4), warp_blur_max=(8, 8, 8), **kwargs)

    def test_label_warp_engine_default_matches_gather(self):
        """With a translation/flip-only affine the default ('auto') label
        warp rides the bf16 one-hot engine and must be bit-identical to the
        gather path for the same keys."""
        labels = jnp.asarray(
            np.random.default_rng(5).integers(0, 6, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'auto'):
            model = self._build(label_warp_impl=impl, aff_shift=3,
                                axes_flip=True)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_array_equal(np.asarray(outs['auto']['map']),
                                      np.asarray(outs['gather']['map']))
        np.testing.assert_allclose(np.asarray(outs['auto']['image']),
                                   np.asarray(outs['gather']['image']),
                                   atol=1e-6)

    def test_label_warp_shear_engine_matches_gather_under_rotation(self):
        """Rotated affines route through the shear-decomposed engine
        (ops.warp.interpn_shear_onehot) and must match the gather path."""
        labels = jnp.asarray(
            np.random.default_rng(6).integers(0, 6, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'onehot'):
            model = self._build(label_warp_impl=impl, aff_rotate=12,
                                aff_scale=0.1, aff_shear=0.05, aff_shift=2)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_array_equal(np.asarray(outs['onehot']['map']),
                                      np.asarray(outs['gather']['map']))

    def test_label_warp_engine_rejects_extreme_rotation(self):
        labels = jnp.asarray(
            np.random.default_rng(6).integers(0, 4, size=(1, 8, 8, 8, 1)),
            jnp.int32)
        model = self._build(label_warp_impl='onehot', aff_rotate=60)
        with pytest.raises(AssertionError, match='30deg'):
            model.init({'params': K0, 'augment': K1}, labels)

    def test_onehot_warp_engine_matches_default(self):
        """warp_impl='onehot' must reproduce the exact-gather pipeline: the
        integrated SVF matches to float tolerance and the synthesized image
        differs at most at knife-edge nearest-neighbor label boundaries."""
        labels = jnp.asarray(
            np.random.default_rng(3).integers(0, 4, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('auto', 'onehot'):
            model = self._build(return_def=True, warp_impl=impl,
                                aff_shift=2, aff_rotate=5)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_allclose(np.asarray(outs['auto']['def']),
                                   np.asarray(outs['onehot']['def']),
                                   atol=1e-5)
        a = np.asarray(outs['auto']['image'])
        b = np.asarray(outs['onehot']['image'])
        mismatch = np.mean(~np.isclose(a, b, atol=1e-5))
        assert mismatch < 0.02, f'{mismatch:.4f} of voxels differ'


class TestWarpBoundRescale:
    def test_tight_user_bound_covers_full_res_label_warp(self):
        """ADVICE r1 (medium): a user warp_max_disp that tightly bounds the
        half-res integrated SVF must still cover the x2-rescaled full-res
        label warp — the label-warp window doubles automatically. The
        one-hot label warp must match the exact gather path."""
        labels = jnp.asarray(
            np.random.default_rng(9).integers(0, 5, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'auto'):
            # warp_max=2 with a TIGHT bound 2.5 (default would be 8):
            # post-rescale displacements reach ~2x the integration bound
            model = ne.models.labels_to_image_new(
                labels_in=list(range(5)), in_shape=(16, 16, 16),
                warp_min=1.5, warp_max=2.0, warp_max_disp=2.5,
                warp_blur_min=(4, 4, 4), warp_blur_max=(8, 8, 8),
                label_warp_impl=impl, aff_shift=1)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_array_equal(np.asarray(outs['auto']['map']),
                                      np.asarray(outs['gather']['map']))


class TestLabelsToImage3DWindowWarp:
    """The round-4 Pallas-window routes (the blast radius measured GONE, so
    custom calls are admissible in the flagship program). On CPU the window
    engine takes its XLA leg — these pin the routing/windowing math; the
    Pallas leg itself is pinned by tests/test_ops_kernels.py."""

    def _build(self, **kwargs):
        return ne.models.labels_to_image_new(
            labels_in=list(range(4)), in_shape=(16, 16, 16),
            warp_blur_min=(4, 4, 4), warp_blur_max=(8, 8, 8), **kwargs)

    def test_window_integration_matches_default(self):
        """warp_impl='window' (guard='none' shrinking per-step windows) must
        reproduce the exact-gather integration to float tolerance."""
        labels = jnp.asarray(
            np.random.default_rng(3).integers(0, 4, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'window'):
            model = self._build(return_def=True, warp_impl=impl,
                                aff_shift=2, aff_rotate=5)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_allclose(np.asarray(outs['gather']['def']),
                                   np.asarray(outs['window']['def']),
                                   atol=1e-5)
        a = np.asarray(outs['gather']['image'])
        b = np.asarray(outs['window']['image'])
        mismatch = np.mean(~np.isclose(a, b, atol=1e-5))
        assert mismatch < 0.02, f'{mismatch:.4f} of voxels differ'

    def test_label_warp_window_matches_gather(self):
        """label_warp_impl='window' (value gathers, shift bound folded into
        the window) must be bit-identical to the gather path."""
        labels = jnp.asarray(
            np.random.default_rng(5).integers(0, 6, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'window'):
            model = self._build(label_warp_impl=impl, aff_shift=3)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        np.testing.assert_array_equal(np.asarray(outs['window']['map']),
                                      np.asarray(outs['gather']['map']))
        np.testing.assert_allclose(np.asarray(outs['window']['image']),
                                   np.asarray(outs['gather']['image']),
                                   atol=1e-6)

    def test_label_warp_window_rejects_rotation_and_flip(self):
        labels = jnp.asarray(
            np.random.default_rng(6).integers(0, 4, size=(1, 8, 8, 8, 1)),
            jnp.int32)
        model = self._build(label_warp_impl='window', aff_rotate=30)
        with pytest.raises(AssertionError, match='translation'):
            model.init({'params': K0, 'augment': K1}, labels)
        # z/y axis reversals are unabsorbable by static windows: the one-hot
        # engine's dynamic block starts take them, the Pallas path must not
        model = self._build(label_warp_impl='window', axes_flip=True)
        with pytest.raises(AssertionError, match='flip'):
            model.init({'params': K0, 'augment': K1}, labels)

    def test_svf_clip_enforces_bound_and_engine_parity(self):
        """The drawn velocity field is clipped to +-warp_max_disp, so the
        window bound is rigorous — engines must agree bit-for-bit even when
        the raw Gaussian draw exceeds the bound (tiny warp_max_disp forces
        the clip to bite)."""
        labels = jnp.asarray(
            np.random.default_rng(9).integers(0, 4, size=(1, 16, 16, 16, 1)),
            jnp.int32)
        outs = {}
        for impl in ('gather', 'window'):
            model = self._build(return_vel=True, return_def=True,
                                warp_impl=impl, warp_max=4,
                                warp_max_disp=1.5)
            v = model.init({'params': K0, 'augment': K1}, labels)
            outs[impl] = model.apply(v, labels, rngs={'augment': K1})
        vel = np.asarray(outs['gather']['vel'])
        assert np.max(np.abs(vel)) <= 1.5 + 1e-6
        # the clip must actually bite for this draw to test anything
        assert np.max(np.abs(vel)) > 1.5 - 1e-3
        # full-res def field clipped to the doubled bound
        assert np.max(np.abs(np.asarray(outs['gather']['def']))) <= 3.0 + 1e-5
        np.testing.assert_allclose(np.asarray(outs['gather']['def']),
                                   np.asarray(outs['window']['def']),
                                   atol=1e-5)
