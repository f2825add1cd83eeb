"""
Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5): pjit DP+spatial train step correctness vs single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import neurite_tpu as ne
from neurite_tpu import training
from neurite_tpu.parallel import create_mesh, make_sharded_train_step, shard_batch


@pytest.fixture(scope='module')
def setup():
    model = ne.models.unet(nb_features=4, input_shape=(16, 16, 16, 1),
                           nb_levels=2, conv_size=3, nb_labels=2,
                           nb_conv_per_level=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32))
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, size=(8, 16, 16, 16))), 2)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.sgd(1e-2))
    loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
    step = training.make_train_step(loss_fn)
    return state, step, (x, y)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_robust_multi_gpu_wraps_dp(setup):
    # the reference-parity wrapper: >1 device -> data-parallel sharded step
    # (r4: replaces the NotImplementedError pointer)
    state, step, batch = setup
    from neurite_tpu import parallel
    from neurite_tpu.utils.model import robust_multi_gpu
    wrapped = robust_multi_gpu(step, verbose=False, space_axis=None,
                               donate_state=False)
    assert wrapped.mesh is not None
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    s8, m8 = wrapped(state, parallel.shard_batch(
        batch, wrapped.mesh, space_axis=None), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=1e-5)


def test_dp_matches_single_device(setup):
    state, step, batch = setup
    # single device
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    # data parallel over 8
    mesh = create_mesh(data=8, space=1)
    sharded_step = make_sharded_train_step(step, mesh, space_axis=None,
                                           donate_state=False)
    s8, m8 = sharded_step(state, shard_batch(batch, mesh, space_axis=None),
                          jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=1e-5)
    # params after update must match
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_dp_plus_spatial_matches(setup):
    state, step, batch = setup
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    # 4-way data x 2-way spatial sharding: XLA inserts conv halo exchange
    mesh = create_mesh(data=4, space=2)
    sharded_step = make_sharded_train_step(step, mesh, space_axis=1,
                                           donate_state=False)
    s8, m8 = sharded_step(state, shard_batch(batch, mesh, space_axis=1),
                          jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_train_step_traces_once(setup):
    """Regression (round-1 VERDICT weak #4): the jit wrapper must be built
    once, not per call — N calls with the same batch structure = 1 trace."""
    state, step, batch = setup
    traces = []

    def counting_step(st, b, rng):
        traces.append(1)
        return step(st, b, rng)

    mesh = create_mesh(data=4, space=2)
    run = make_sharded_train_step(counting_step, mesh, space_axis=1,
                                  donate_state=False)
    sharded = shard_batch(batch, mesh, space_axis=1)
    st = state
    for i in range(3):
        st, _ = run(st, sharded, jax.random.PRNGKey(i))
    assert len(traces) == 1, f'expected 1 trace for 3 calls, got {len(traces)}'


def test_spatially_sharded_interpn():
    """interpn under spatial sharding (resize use case) stays correct."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = create_mesh(data=1, space=8)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(32, 16, 2)).astype(np.float32))

    def f(v):
        return ne.utils.resize(v, [2, 2])

    want = f(vol)
    vs = jax.device_put(vol, NamedSharding(mesh, P('space', None, None)))
    got = jax.jit(f)(vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shard_batch_multihost_single_process():
    """Single-process path must equal shard_batch placement."""
    from neurite_tpu import parallel
    mesh = parallel.create_mesh(data=4, space=2)
    x = np.random.default_rng(0).normal(size=(8, 6, 6, 1)).astype(np.float32)
    a = parallel.shard_batch({'x': x}, mesh)['x']
    b = parallel.shard_batch_multihost({'x': x}, mesh)['x']
    assert a.sharding == b.sharding
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_synth_train_step_data_parallel_matches_single_device():
    """BASELINE config #5 (on-device synthesis -> UNet train) under a
    data x space mesh: GSPMD shards the one-hot warp engines' block scans
    over the batch axis; loss must match the single-device program."""
    import optax
    from neurite_tpu import parallel, training

    size, nbl, bs = 8, 4, 4
    gen = ne.models.labels_to_image_new(labels_in=list(range(nbl)),
                                        out_shape=(size,) * 3, one_hot=True)
    unet = ne.models.unet(nb_features=2, input_shape=(size,) * 3 + (1,),
                          nb_levels=2, conv_size=3, nb_labels=nbl)
    labels = jnp.asarray(np.random.default_rng(0).integers(
        0, nbl, size=(bs, size, size, size, 1)), jnp.int32)
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)
    state = training.create_train_state(
        unet, jax.random.PRNGKey(0), jnp.zeros((1,) + (size,) * 3 + (1,)),
        optax.adam(1e-3))
    loss = ne.losses.SoftDice(check_input_limits=False).loss
    base = training.make_train_step(loss)

    def synth_step(st, lab, key):
        out = gen.apply(gv, lab, rngs={'augment': key})
        return base(st, (out['image'], out['map']), key)

    _, m1 = jax.jit(synth_step)(state, labels, jax.random.PRNGKey(2))
    mesh = parallel.create_mesh(data=4, space=2)
    run = parallel.make_sharded_train_step(synth_step, mesh)
    _, m2 = run(state, labels, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-4)


def test_mean_stream_axis_name_matches_global_batch():
    """MeanStream under shard_map with axis_name must equal the
    single-device update on the full batch (SURVEY §7.3: psum of batch sums
    before the cap-weighted update)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 5)), jnp.float32)
    single = ne.layers.MeanStream(cap=10)
    v = single.init(jax.random.PRNGKey(0), x, training=True)
    _, want = single.apply(v, x, training=True, mutable=['stream_stats'])

    sharded = ne.layers.MeanStream(cap=10, axis_name='data')
    # init outside shard_map must work (no psum while initializing)
    v = sharded.init(jax.random.PRNGKey(0), x, training=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ('data',))

    def step(xs):
        _, vs = sharded.apply(v, xs, training=True, mutable=['stream_stats'])
        return vs['stream_stats']['mean'], vs['stream_stats']['count']

    mean, count = jax.jit(shard_map(
        step, mesh=mesh, in_specs=P('data'), out_specs=P()))(x)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(want['stream_stats']['mean']),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(count),
                               np.asarray(want['stream_stats']['count']),
                               rtol=1e-6)


def test_cov_stream_axis_name_matches_global_batch():
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)), jnp.float32)
    single = ne.layers.CovStream(cap=10)
    v = single.init(jax.random.PRNGKey(0), x, training=True)
    _, want = single.apply(v, x, training=True, mutable=['stream_stats'])

    sharded = ne.layers.CovStream(cap=10, axis_name='data')
    v = sharded.init(jax.random.PRNGKey(0), x, training=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ('data',))

    def step(xs):
        _, vs = sharded.apply(v, xs, training=True, mutable=['stream_stats'])
        return vs['stream_stats']['cov']

    cov = jax.jit(shard_map(step, mesh=mesh, in_specs=P('data'),
                            out_specs=P()))(x)
    np.testing.assert_allclose(np.asarray(cov),
                               np.asarray(want['stream_stats']['cov']),
                               rtol=1e-5)


def test_lc_head_tensor_parallel_weights():
    """TP/weight-parallel axis (SURVEY §2.10): the LocallyConnected3D head's
    kernel is per-voxel, so sharding the voxel axis over 'space' alongside
    the input's spatial sharding needs NO collectives for the layer itself —
    per-device weight memory drops by the space factor. The head-style
    (filters=1, stride 1) branch stores the kernel TRANSPOSED,
    [O, k^3*Cin, V] (ops/lc_tap.py), so the voxel axis is LAST.
    Parity vs the unsharded step, and shard shapes verified."""
    from jax.sharding import PartitionSpec as P
    from neurite_tpu import parallel, training

    import flax.linen as nn

    size, cin, cout = 8, 2, 1

    class LCHead(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            return ne.layers.LocallyConnected3D(
                filters=cout, kernel_size=3, padding='same',
                name='lc_head')(x)

    model = LCHead()
    rng_ = np.random.default_rng(3)
    x = jnp.asarray(rng_.normal(size=(4, size, size, size, cin)), jnp.float32)
    y = jnp.asarray(rng_.normal(size=(4, size, size, size, cout)),
                    jnp.float32)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))

    def loss_fn(pred, target):
        return jnp.mean((pred - target) ** 2)

    step = training.make_train_step(lambda t, p: loss_fn(p, t))
    s1, m1 = jax.jit(step)(state, (x, y), jax.random.PRNGKey(1))

    mesh = parallel.create_mesh(data=4, space=2)
    specs = {"['kernel']": P(None, None, 'space'), "['bias']": P('space')}
    run = parallel.make_sharded_train_step(step, mesh, space_axis=1,
                                           donate_state=False,
                                           param_specs=specs)
    s2, m2 = run(state, parallel.shard_batch((x, y), mesh, space_axis=1),
                 jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.params['lc_head']['kernel']),
                               np.asarray(s1.params['lc_head']['kernel']),
                               rtol=2e-4, atol=2e-6)
    # the kernel must actually live sharded: V/2 voxel columns per device
    k = s2.params['lc_head']['kernel']
    V = size ** 3
    shard_cols = {s.data.shape[-1] for s in k.addressable_shards}
    assert shard_cols == {V // 2}, shard_cols
    # and its adam moments shard identically
    mu = s2.opt_state[0].mu['lc_head']['kernel']
    assert {s.data.shape[-1] for s in mu.addressable_shards} == {V // 2}
