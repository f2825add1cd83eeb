"""
Tests for the inference/analysis layer: whole-volume patch prediction
(utils.seg), VAE latent tools (utils.vae), and model utilities (utils.model)
— SURVEY.md §2.8/§2.7 capability rows.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import neurite_tpu as ne
from neurite_tpu.io import tiling
from neurite_tpu.utils import seg as seg_utils
from neurite_tpu.utils import vae as vae_utils
from neurite_tpu.utils import model as model_utils


rng = np.random.default_rng(11)


def _patch_pair_gen(vol, labels, patch_size, stride, batch_size, nb_labels):
    """(input patch batch, one-hot label patch batch) generator."""
    vp = list(tiling.patch_gen(vol, patch_size, stride))
    lp = list(tiling.patch_gen(labels, patch_size, stride))
    idx = 0
    while True:
        xs, ys = [], []
        for _ in range(batch_size):
            xs.append(vp[idx % len(vp)][..., None])
            ys.append(np.eye(nb_labels)[lp[idx % len(lp)]])
            idx += 1
        yield np.stack(xs), np.stack(ys)


class TestSeg:
    def test_predict_volumes_roundtrip(self):
        """Identity 'model' + quilt must reproduce the label volume."""
        vol_shape = (12, 12)
        nb_labels = 3
        labels = rng.integers(0, nb_labels, size=vol_shape)
        vol = labels.astype(np.float32)
        patch_size, stride, bs = (6, 6), (3, 3), 2

        # "model": one-hot of the rounded input patch -> perfect prediction
        def apply_fn(x):
            return jax.nn.one_hot(
                jnp.round(x[..., 0]).astype(jnp.int32), nb_labels)

        gen = _patch_pair_gen(vol, labels, patch_size, stride, bs, nb_labels)
        pred_label, true_label = seg_utils.predict_volumes(
            apply_fn, gen, bs, patch_size, stride, vol_shape)
        np.testing.assert_array_equal(pred_label, labels)
        np.testing.assert_array_equal(true_label, labels)

    def test_predict_volumes_extra_vols(self):
        vol_shape = (8, 8)
        labels = rng.integers(0, 2, size=vol_shape)
        vol = labels.astype(np.float32)

        def apply_fn(x):
            return jax.nn.one_hot(
                jnp.round(x[..., 0]).astype(jnp.int32), 2)

        gen = _patch_pair_gen(vol, labels, (4, 4), (4, 4), 1, 2)
        out = seg_utils.predict_volumes(
            apply_fn, gen, 1, (4, 4), (4, 4), vol_shape, do_extra_vol=True,
            do_prob_of_true=True)
        pred_label, true_label, vol_in, prob_pred, prob_true = out
        np.testing.assert_array_equal(pred_label, labels)
        np.testing.assert_allclose(vol_in, vol, atol=1e-6)
        np.testing.assert_allclose(prob_pred, 1.0, atol=1e-6)
        np.testing.assert_allclose(prob_true, 1.0, atol=1e-6)

    def test_prob_of_label_and_pred_to_label(self):
        pred = rng.uniform(0, 1, size=(2, 4, 4, 3)).astype(np.float32)
        lab = seg_utils.pred_to_label(pred)
        prob = seg_utils.prob_of_label(pred, lab)
        np.testing.assert_allclose(prob, pred.max(-1), atol=1e-6)

    def test_recode_dict_and_list(self):
        s = jnp.asarray([[0, 1], [2, 1]])
        out = seg_utils.recode(s, {0: 0, 1: 5, 2: 7})
        np.testing.assert_array_equal(np.asarray(out), [[0, 5], [7, 5]])
        out2 = seg_utils.recode(s, [0, 5, 7])
        np.testing.assert_array_equal(np.asarray(out2), [[0, 5], [7, 5]])

    def test_next_label_helpers(self):
        def apply_fn(x):
            return jax.nn.one_hot(jnp.zeros(x.shape[:-1], jnp.int32), 2)
        gen = iter([(np.zeros((1, 4, 4, 1), np.float32),
                     np.eye(2)[np.zeros((1, 4, 4), int)])] * 3)
        t, p = seg_utils.next_label(apply_fn, gen)
        np.testing.assert_array_equal(t, p)


class TestVae:
    def _fit_vae(self, do_vae=True):
        model = ne.models.ae(
            nb_features=4, input_shape=(8, 8, 1), nb_levels=2, conv_size=3,
            nb_labels=1, enc_size=[5], ae_type='dense',
            final_pred_activation='linear', do_vae=do_vae)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'sample': jax.random.PRNGKey(1)}, x)
        return model, variables, x

    def test_extract_z_dec_and_sample(self):
        model, variables, x = self._fit_vae()
        decode_fn, z_shape = vae_utils.extract_z_dec(
            model, variables, x, sample_rng=jax.random.PRNGKey(2))
        assert z_shape == (5,)
        out, z = vae_utils.sample_dec(decode_fn, z_shape, nb_samples=3,
                                      seed=0)
        assert out.shape == (3, 8, 8, 1)
        out2, z2 = vae_utils.sample_dec(decode_fn, z_shape, nb_samples=4,
                                        sweep_dim=2)
        assert out2.shape[0] == 4
        assert np.allclose(np.asarray(z2).reshape(4, -1)[:, 0], 0)

    def test_decode_consistency_with_full_apply(self):
        """encode + decode must equal the full forward pass (same rng)."""
        model, variables, x = self._fit_vae()
        rngs = {'sample': jax.random.PRNGKey(3)}
        full = model.apply(variables, x, rngs=rngs)
        z = model.apply(variables, x, mode='encode', rngs=rngs)
        enc_shape = vae_utils.enc_output_shape(model, variables, x)
        dec = model.apply(variables, z, mode='decode', enc_shape=enc_shape)
        np.testing.assert_allclose(np.asarray(full), np.asarray(dec),
                                   atol=1e-5)

    def test_z_effect(self):
        model, variables, x = self._fit_vae()
        decode_fn, z_shape = vae_utils.extract_z_dec(
            model, variables, x, sample_rng=jax.random.PRNGKey(2))
        z_mu = jnp.zeros((2,) + z_shape)
        eff = vae_utils.z_effect(decode_fn, z_mu)
        assert eff.shape == z_shape
        assert np.all(np.asarray(eff) >= 0)

    def test_sweep_dec_given_x(self):
        model, variables, x = self._fit_vae()
        decode_fn, _ = vae_utils.extract_z_dec(
            model, variables, x, sample_rng=jax.random.PRNGKey(2))
        out, z = vae_utils.sweep_dec_given_x(
            model, variables, decode_fn, x[:1], x[1:], nb_steps=4)
        assert out.shape == (4, 8, 8, 1)

    def test_latent_stats(self):
        model, variables, x = self._fit_vae()
        it = itertools.repeat(x)
        stats = vae_utils.latent_stats(model, variables, it, nb_batches=3)
        assert stats['mu'].shape == (6, 5)
        assert stats['logvar'].shape == (6, 5)

    def test_pca_init_dense_roundtrip(self):
        model, variables, x = self._fit_vae(do_vae=False)
        xb = jnp.asarray(rng.normal(size=(16, 8, 8, 1)), jnp.float32)
        new_vars = vae_utils.pca_init_dense(model, variables, xb)
        # mu dense kernel now holds orthonormal axes
        k = np.asarray(new_vars['params']['mid']['ae_mu_enc_dense']['kernel'])
        gram = k.T @ k
        np.testing.assert_allclose(gram, np.eye(k.shape[1]), atol=1e-4)


class TestModelUtils:
    def test_stack_models(self):
        f = ne.utils.stack_models([lambda x: x + 1, lambda x: x * 2])
        assert f(3) == 8

    def test_module_paths_lists_interior_modules(self):
        model = ne.models.unet(nb_features=4, input_shape=(8, 8, 1),
                               nb_levels=2, conv_size=3, nb_labels=2)
        paths = ne.utils.module_paths(model, jax.random.PRNGKey(0),
                                      jnp.zeros((1, 8, 8, 1)))
        assert 'enc' in paths and 'dec' in paths
        assert any(p.startswith('enc/') for p in paths)

    def test_sub_apply_tap_unet_arbitrary_level(self):
        """Feature tap at an arbitrary interior module (encoder level 1) —
        the capability reference mod_submodel provided via graph surgery."""
        model = ne.models.unet(nb_features=4, input_shape=(8, 8, 1),
                               nb_levels=2, conv_size=3, nb_labels=2)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        paths = ne.utils.module_paths(model, jax.random.PRNGKey(0), x)
        enc_convs = [p for p in paths if p.startswith('enc/')]
        tap = ne.utils.sub_apply(model, v, x, until='enc')
        # ConvEnc returns (bottleneck, skips): tap is that exact value
        bott, skips = tap
        assert bott.shape[0] == 2 and bott.shape[-1] == 4
        assert len(skips) == 2
        # multi-tap returns a dict
        taps = ne.utils.sub_apply(model, v, x, until=[enc_convs[0], 'enc'])
        assert set(taps) == {enc_convs[0], 'enc'}

    def test_sub_apply_inject_matches_decode_mode(self):
        """Input-side cut on the AE: injecting z at 'mid' must equal the
        explicit decode mode (extract_z_dec on arbitrary architectures)."""
        model = ne.models.ae(nb_features=4, input_shape=(8, 8, 1),
                             nb_levels=2, conv_size=3, nb_labels=1,
                             enc_size=[5], ae_type='dense',
                             final_pred_activation='linear')
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        mid_out = ne.utils.sub_apply(model, v, x, until='mid')
        want = model.apply(v, x)
        # inject mid's output with a dummy input: downstream-only execution
        got = ne.utils.sub_apply(model, v, jnp.zeros_like(x),
                                 inject={'mid': mid_out})
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_mod_submodel_cut_fn(self):
        model = ne.models.unet(nb_features=4, input_shape=(8, 8, 1),
                               nb_levels=2, conv_size=3, nb_labels=2)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        # decoder-from-bottleneck sub-model; jit-able
        bott = ne.utils.sub_apply(model, v, x, until='enc')
        dec_fn = ne.utils.mod_submodel(model, v, x, from_layer='enc')
        out = jax.jit(dec_fn)(bott)
        want = model.apply(v, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5)
        # tap-only sub-model consumes regular inputs
        tap_fn = ne.utils.mod_submodel(model, v, x, to_layer='enc')
        got_bott, got_skips = tap_fn(x)
        np.testing.assert_allclose(np.asarray(got_bott), np.asarray(bott[0]),
                                   atol=1e-5)

    def test_reset_and_copy_weights(self):
        model = ne.models.unet(nb_features=4, input_shape=(8, 8, 1),
                               nb_levels=2, conv_size=3, nb_labels=2)
        x = jnp.zeros((1, 8, 8, 1))
        v1 = model.init(jax.random.PRNGKey(0), x)
        v2 = ne.utils.reset_weights(model, jax.random.PRNGKey(1), x)
        # different init -> different weights
        l1 = jax.tree_util.tree_leaves(v1)
        l2 = jax.tree_util.tree_leaves(v2)
        assert any(not np.allclose(a, b) for a, b in zip(l1, l2))
        v3 = ne.utils.copy_weights(v1, v2)
        for a, b in zip(jax.tree_util.tree_leaves(v1),
                        jax.tree_util.tree_leaves(v3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_param_count_and_diagram(self):
        model = ne.models.unet(nb_features=2, input_shape=(8, 8, 1),
                               nb_levels=2, conv_size=3, nb_labels=2)
        x = jnp.zeros((1, 8, 8, 1))
        v = model.init(jax.random.PRNGKey(0), x)
        n = ne.utils.param_count(v['params'])
        assert n > 0
        table = ne.utils.diagram(model, x)
        assert 'params' in table


def test_predict_volume_device_matches_host_quilt():
    """On-device patch inference == per-patch host apply + mean quilt."""
    import jax
    from neurite_tpu.io import tiling
    from neurite_tpu.utils import seg

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(10, 12, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)

    def apply_fn(x):                      # toy "model": channel mixing + relu
        return jax.nn.relu(x @ w)

    got = seg.predict_volume_device(apply_fn, vol, (6, 6, 4),
                                    stride=(4, 6, 4))
    patches = [np.asarray(apply_fn(jnp.asarray(p)[None])[0]) for p in
               tiling.patch_gen(np.asarray(vol), (6, 6, 4), stride=(4, 6, 4))]
    want = np.stack([
        tiling.quilt([p[..., c] for p in patches], (6, 6, 4), (10, 12, 8),
                     stride=(4, 6, 4), agg='nanmean')
        for c in range(3)], -1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_predict_volume_device_jits():
    import jax
    from neurite_tpu.utils import seg
    vol = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8, 1)),
                      jnp.float32)
    f = jax.jit(lambda v: seg.predict_volume_device(
        lambda p: p * 2., v, (4, 4), stride=(4, 4)))
    np.testing.assert_allclose(np.asarray(f(vol)), np.asarray(vol) * 2,
                               atol=1e-6)
