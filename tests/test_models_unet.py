"""
Model-graph tests (SURVEY.md §4 item 3) + the minimum end-to-end train slice
(BASELINE config #1: 2D UNet on synthetic labelmaps with soft-Dice loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import neurite_tpu as ne
from neurite_tpu import training


def _init(model, shape, **kwargs):
    x = jnp.zeros(shape)
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    return variables, x


class TestUNetShapes:
    @pytest.mark.parametrize('ndims,shape', [
        (1, (2, 16, 1)), (2, (2, 16, 16, 1)), (3, (1, 8, 8, 8, 1))])
    def test_output_shapes(self, ndims, shape):
        model = ne.models.unet(nb_features=4, input_shape=shape[1:],
                               nb_levels=2, conv_size=3, nb_labels=3)
        variables, x = _init(model, shape)
        y = model.apply(variables, x)
        assert y.shape == (*shape[:-1], 3)
        # softmax output sums to 1 over labels
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)

    def test_nb_features_list_of_lists(self):
        # list-of-lists overrides nb_levels/feat_mult (ref models.py:179-190)
        model = ne.models.unet(nb_features=[[4, 4], [8, 8], [16]],
                               input_shape=(16, 16, 1), nb_levels=None,
                               conv_size=3, nb_labels=2)
        variables, x = _init(model, (1, 16, 16, 1))
        y = model.apply(variables, x)
        assert y.shape == (1, 16, 16, 2)
        # check per-level conv feature counts from param shapes
        p = variables['params']['enc']
        assert p['conv_downarm_0_0']['kernel'].shape[-1] == 4
        assert p['conv_downarm_1_0']['kernel'].shape[-1] == 8
        assert p['conv_downarm_2_0']['kernel'].shape[-1] == 16

    def test_feat_mult(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=3, conv_size=3, nb_labels=2,
                               feat_mult=2)
        variables, x = _init(model, (1, 16, 16, 1))
        p = variables['params']['enc']
        assert p['conv_downarm_0_0']['kernel'].shape[-1] == 4
        assert p['conv_downarm_1_0']['kernel'].shape[-1] == 8
        assert p['conv_downarm_2_0']['kernel'].shape[-1] == 16

    def test_residuals_and_multiconv(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=2, conv_size=3, nb_labels=2,
                               use_residuals=True, nb_conv_per_level=2)
        variables, x = _init(model, (1, 16, 16, 1))
        y = model.apply(variables, x)
        assert y.shape == (1, 16, 16, 2)

    def test_final_linear(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=2, conv_size=3, nb_labels=2,
                               final_pred_activation='linear')
        variables, x = _init(model, (1, 16, 16, 1))
        y = model.apply(variables, x)
        s = np.asarray(y).sum(-1)
        assert not np.allclose(s, 1.0)  # not softmaxed

    def test_multi_input(self):
        model = ne.models.unet(nb_features=4,
                               input_shape=[(16, 16, 1), (16, 16, 2)],
                               nb_levels=2, conv_size=3, nb_labels=2)
        xs = [jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 2))]
        variables = model.init(jax.random.PRNGKey(0), xs)
        y = model.apply(variables, xs)
        assert y.shape == (1, 16, 16, 2)

    def test_add_prior_layer(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=2, conv_size=3, nb_labels=3,
                               add_prior_layer=True)
        x = jnp.zeros((1, 16, 16, 1))
        prior = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x, prior=prior)
        y = model.apply(variables, x, prior=prior)
        assert y.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)

    def test_conv_enc_returns_skips(self):
        model = ne.models.conv_enc(nb_features=4, input_shape=(16, 16, 1),
                                   nb_levels=3, conv_size=3)
        x = jnp.zeros((1, 16, 16, 1))
        variables = model.init(jax.random.PRNGKey(0), x)
        bottleneck, skips = model.apply(variables, x)
        assert len(skips) == 3
        assert skips[0].shape == (1, 16, 16, 4)
        assert skips[1].shape == (1, 8, 8, 4)
        assert bottleneck.shape == (1, 4, 4, 4)

    def test_batch_norm(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=2, conv_size=3, nb_labels=2,
                               batch_norm=-1)
        x = jnp.zeros((1, 16, 16, 1))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert 'batch_stats' in variables
        y, updates = model.apply(variables, x, training=True,
                                 mutable=['batch_stats'])
        assert y.shape == (1, 16, 16, 2)

    def test_dropout(self):
        model = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                               nb_levels=2, conv_size=3, nb_labels=2,
                               conv_dropout=0.5)
        x = jnp.ones((1, 16, 16, 1))
        variables = model.init(jax.random.PRNGKey(0), x)
        y1 = model.apply(variables, x, training=True,
                         rngs={'dropout': jax.random.PRNGKey(1)})
        y2 = model.apply(variables, x, training=False)
        assert y1.shape == y2.shape


class TestDiceMetrics:
    def test_dice_self_is_one(self):
        # absent labels give 0/0 -> 0 under safe division (ref div_no_nan)
        y = jax.nn.one_hot(jnp.asarray([[0, 1], [2, 1]]), 3)
        d = ne.metrics.Dice().dice(y, y)
        np.testing.assert_allclose(d, [[1, 1, 0], [0, 1, 1]], rtol=1e-6)

    def test_dice_disjoint_is_zero(self):
        a = jax.nn.one_hot(jnp.zeros((1, 4), jnp.int32), 2)
        b = jax.nn.one_hot(jnp.ones((1, 4), jnp.int32), 2)
        d = ne.metrics.Dice(check_input_limits=False).dice(a, b)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_hard_dice_max_label(self):
        yt = jnp.asarray([[0, 1, 1, 2]])
        yp = jnp.asarray([[0, 1, 2, 2]])
        d = np.asarray(ne.metrics.HardDice(nb_labels=3).dice(yt, yp))
        np.testing.assert_allclose(d[0], [1.0, 2 / 3, 2 / 3], rtol=1e-6)

    def test_laplace_smoothing(self):
        a = jnp.zeros((1, 4, 2))
        d = ne.metrics.Dice(laplace_smoothing=1e-5,
                            check_input_limits=False).dice(a, a)
        np.testing.assert_allclose(d, 1.0, rtol=1e-6)

    def test_mean_dice_weights(self):
        y = jax.nn.one_hot(jnp.asarray([[0, 1]]), 2)
        m = ne.metrics.Dice(weights=np.array([[1.0, 0.0]]))
        np.testing.assert_allclose(m.mean_dice(y, y), 0.5, rtol=1e-6)

    def test_dice_loss_negated(self):
        y = jax.nn.one_hot(jnp.asarray([[0, 1]]), 2)
        loss = ne.losses.SoftDice().loss(y, y)
        np.testing.assert_allclose(loss, -1.0, rtol=1e-6)

    def test_check_limits_raises(self):
        y = jnp.full((1, 4, 2), 2.0)
        with pytest.raises(ValueError):
            ne.metrics.Dice().dice(y, y)


class TestMutualInformation:
    def test_identical_volumes_high_mi(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(2, 64, 1)).astype(np.float32))
        mi = ne.metrics.MutualInformation(nb_bins=8)
        mi_xx = np.asarray(mi.volumes(x, x))
        y = jnp.asarray(rng.uniform(size=(2, 64, 1)).astype(np.float32))
        mi_xy = np.asarray(mi.volumes(x, y))
        assert (mi_xx > mi_xy).all()

    def test_symmetry(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(1, 32, 4)).astype(np.float32))
        y = jnp.asarray(rng.uniform(size=(1, 32, 4)).astype(np.float32))
        mi = ne.metrics.MutualInformation(nb_bins=6)
        np.testing.assert_allclose(mi.maps(x, y), mi.maps(y, x), rtol=1e-4)

    def test_channelwise_shape(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        mi = ne.metrics.MutualInformation(nb_bins=5)
        out = mi.channelwise(x, x)
        assert out.shape == (2, 3)

    def test_volume_seg(self):
        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.uniform(size=(2, 16, 1)).astype(np.float32))
        s = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, size=(2, 16))), 3)
        mi = ne.metrics.MutualInformation(nb_bins=4)
        out = mi.volume_seg(v, s)
        assert out.shape == (2,)


class TestWeightedLosses:
    def test_cce_matches_formula(self):
        y_true = jax.nn.one_hot(jnp.asarray([[0, 1, 2]]), 3)
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 3)),
                             jnp.float32)
        y_pred = jax.nn.softmax(logits)
        got = ne.losses.CategoricalCrossentropy().loss(y_true, y_pred)
        want = -np.mean(np.sum(np.asarray(y_true) *
                               np.log(np.asarray(y_pred)), -1))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_cce_label_weights(self):
        y_true = jax.nn.one_hot(jnp.asarray([[0, 1]]), 2)
        y_pred = jnp.asarray([[[0.9, 0.1], [0.2, 0.8]]])
        lw = [1.0, 0.0]
        got = ne.losses.CategoricalCrossentropy(label_weights=lw).loss(
            y_true, y_pred)
        want = -np.mean([np.log(0.9), 0.0])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mse_prob_weights(self):
        y_true = jnp.asarray([[0.0, 1.0]])
        y_pred = jnp.asarray([[1.0, 0.0]])
        got = ne.losses.MeanSquaredErrorProb(label_weights=[1.0, 3.0]).loss(
            y_true, y_pred)
        np.testing.assert_allclose(got, (1 * 1 + 3 * 1) / 2, rtol=1e-6)

    def test_soft_l0(self):
        reg = ne.regularizers.soft_l0_wrap()
        dense = jnp.ones(100)
        sparse = jnp.zeros(100)
        assert float(reg(dense)) > float(reg(sparse))
        assert float(reg(sparse)) == pytest.approx(0.0, abs=1e-3)


def synthetic_labelmap_batches(key, batch_size, size, nb_labels):
    """Synthetic 2D circles labelmap generator (BASELINE config #1 data)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:size, :size]
    while True:
        imgs, segs = [], []
        for _ in range(batch_size):
            cx, cy = rng.uniform(size * 0.3, size * 0.7, 2)
            r = rng.uniform(size * 0.1, size * 0.25)
            lab = ((yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2).astype(np.int32)
            img = lab + rng.normal(0, 0.1, lab.shape)
            imgs.append(img[..., None].astype(np.float32))
            segs.append(lab)
        x = jnp.asarray(np.stack(imgs))
        y = jax.nn.one_hot(jnp.asarray(np.stack(segs)), nb_labels)
        yield x, y


class TestEndToEndTrain:
    def test_unet_dice_loss_decreases(self):
        """BASELINE config #1: 2D UNet + soft Dice on synthetic labelmaps."""
        nb_labels = 2
        model = ne.models.unet(nb_features=8, input_shape=(32, 32, 1),
                               nb_levels=2, conv_size=3, nb_labels=nb_labels,
                               nb_conv_per_level=2)
        data = synthetic_labelmap_batches(None, 4, 32, nb_labels)
        x0, _ = next(data)

        state = training.create_train_state(
            model, jax.random.PRNGKey(0), x0, optax.adam(1e-3))
        loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
        step = training.make_train_step(loss_fn)

        state, history = training.fit(state, step, data, nb_steps=30,
                                      rng=jax.random.PRNGKey(1), log_every=0)
        losses = [h['loss'] for h in history] if history else []
        # loss starts near 0 (dice ~ 0.5 random) and should clearly decrease
        state2, history = training.fit(state, step, data, nb_steps=1,
                                       rng=jax.random.PRNGKey(2), log_every=1)
        final_loss = history[0]['loss']
        assert final_loss < -0.75, f'dice loss did not improve: {final_loss}'


def test_unet_bf16_compute_dtype():
    """Mixed precision: bf16 compute, f32 params — outputs close to f32."""
    import neurite_tpu as ne
    model32 = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2)
    model16 = ne.models.unet(nb_features=4, input_shape=(16, 16, 1),
                             nb_levels=2, conv_size=3, nb_labels=2,
                             dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 1)),
                    jnp.float32)
    v = model32.init(jax.random.PRNGKey(0), x)
    # params are f32 regardless of compute dtype
    for leaf in jax.tree_util.tree_leaves(v['params']):
        assert leaf.dtype == jnp.float32
    out32 = model32.apply(v, x)
    out16 = model16.apply(v, x)
    assert np.isfinite(np.asarray(out16, np.float32)).all()
    # softmax outputs in [0,1]; bf16 rounding stays within a few 1e-2
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), atol=0.05)


def test_unet_space_to_depth_variant():
    """s2d UNet: same output shape/softmax semantics, trains on folded grid."""
    import neurite_tpu as ne
    model = ne.models.unet(nb_features=4, input_shape=(16, 16, 16, 1),
                           nb_levels=2, conv_size=3, nb_labels=3,
                           space_to_depth=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out.shape == (1, 16, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
    # gradient flows
    g = jax.grad(lambda p: jnp.sum(model.apply({'params': p}, x) ** 2))(
        v['params'])
    assert any(float(jnp.abs(leaf).max()) > 0
               for leaf in jax.tree_util.tree_leaves(g))


def test_unet_im2col_matches_native():
    """conv_impl='im2col' must produce the same outputs from the same params."""
    import neurite_tpu as ne
    kwargs = dict(nb_features=4, input_shape=(16, 16, 16, 1), nb_levels=2,
                  conv_size=3, nb_labels=2)
    m_nat = ne.models.unet(**kwargs)
    m_i2c = ne.models.unet(**kwargs, conv_impl='im2col')
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)),
                    jnp.float32)
    v = m_nat.init(jax.random.PRNGKey(0), x)
    # identical param structure -> same checkpoint loads in both
    v2 = m_i2c.init(jax.random.PRNGKey(0), x)
    s1 = jax.tree_util.tree_structure(v)
    s2 = jax.tree_util.tree_structure(v2)
    assert s1 == s2
    out_nat = m_nat.apply(v, x)
    out_i2c = m_i2c.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_i2c), np.asarray(out_nat),
                               atol=1e-4)
    g = jax.grad(lambda p: jnp.sum(m_i2c.apply({'params': p}, x) ** 2))(
        v['params'])
    gn = jax.grad(lambda p: jnp.sum(m_nat.apply({'params': p}, x) ** 2))(
        v['params'])
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_unet_zdecomp_matches_native():
    """Default 'auto' (z-decomposed 3-D convs) == native conv3d exactly."""
    import neurite_tpu as ne
    kwargs = dict(nb_features=4, input_shape=(12, 12, 12, 1), nb_levels=2,
                  conv_size=3, nb_labels=2)
    m_auto = ne.models.unet(**kwargs)                      # conv_impl='auto'
    m_nat = ne.models.unet(**kwargs, conv_impl='native')
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 12, 12, 1)),
                    jnp.float32)
    v = m_nat.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(m_auto.init(jax.random.PRNGKey(0),
                                                     x)))
    out_a = m_auto.apply(v, x)
    out_n = m_nat.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_n),
                               atol=1e-5)
    ga = jax.grad(lambda p: jnp.sum(m_auto.apply({'params': p}, x) ** 2))(
        v['params'])
    gn = jax.grad(lambda p: jnp.sum(m_nat.apply({'params': p}, x) ** 2))(
        v['params'])
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
