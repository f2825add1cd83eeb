"""
Halo-exchange spatial sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 item 5, §5.7): sharded convs/blurs/reductions must equal their
unsharded counterparts exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurite_tpu import parallel
from neurite_tpu.utils import core


rng = np.random.default_rng(3)


@pytest.fixture(scope='module')
def mesh():
    return parallel.create_mesh(data=2, space=4)


def test_sharded_conv_matches_unsharded(mesh):
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 3, 3, 4)), jnp.float32)

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC')))
    got = parallel.sharded_conv(x, k, mesh, sharded_axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_conv_3d(mesh):
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 6, 2)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 3)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), 'SAME',
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ('NDHWC', 'DHWIO', 'NDHWC')))
    got = parallel.sharded_conv(x, k, mesh, sharded_axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_conv_rejects_even_kernel(mesh):
    x = jnp.zeros((1, 8, 8, 1))
    k = jnp.zeros((4, 3, 1, 1))
    with pytest.raises(AssertionError):
        parallel.sharded_conv(x, k, mesh, sharded_axis=1)


def test_sharded_blur_matches_separable_conv(mesh):
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 1)), jnp.float32)
    kernels = [core.gaussian_kernel(1.5, separate=True),
               core.gaussian_kernel(0.8, separate=True)]
    want = core.separable_conv(x, kernels, batched=True)
    got = parallel.sharded_separable_blur(x, kernels, mesh, sharded_axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_dice_sums(mesh):
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 4, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 4, 3)), jnp.float32)
    got = parallel.sharded_dice_sums(x, y, mesh, sharded_axis=1)
    xf = x.reshape(2, -1, 3)
    yf = y.reshape(2, -1, 3)
    want = (jnp.sum(xf * yf, 1), jnp.sum(xf * xf, 1), jnp.sum(yf * yf, 1))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_halo_exchange_boundary_modes(mesh):
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 1)), jnp.float32)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from neurite_tpu.parallel.halo import halo_exchange

    for boundary in ('zero', 'edge'):
        f = shard_map(
            lambda t: halo_exchange(t, 2, 1, boundary=boundary),
            mesh=mesh, in_specs=P(None, 'space'),
            out_specs=P(None, 'space'))
        out = np.asarray(f(x))
        assert out.shape == (2, 16 + 2 * 8, 4, 1)  # each of 4 shards +4

    # zero mode: global left edge must be zeros
    f0 = shard_map(
        lambda t: halo_exchange(t, 2, 1, boundary='zero'),
        mesh=mesh, in_specs=P(None, 'space'), out_specs=P(None, 'space'))
    out = np.asarray(f0(x))
    np.testing.assert_allclose(out[:, :2], 0.)


def test_sharded_bounded_warp_matches_unsharded():
    """Halo-exchange + shard-local one-hot warp == unsharded warp (both
    linear and nearest, with and without channels/fill)."""
    from neurite_tpu.parallel import halo, mesh as pmesh
    from neurite_tpu.utils import spatial

    mesh = pmesh.create_mesh(data=1, space=4)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(2, 16, 8, 8)), jnp.float32)
    shift = jnp.asarray(rng.uniform(-2., 2., size=(2, 16, 8, 8, 3)),
                        jnp.float32)

    for method in ('linear', 'nearest'):
        want = spatial.batch_transform(vol, shift, interp_method=method,
                                       fill_value=0., impl='onehot',
                                       max_disp=3.0)
        got = halo.sharded_bounded_warp(vol, shift, mesh, max_disp=3.0,
                                        interp_method=method, fill_value=0.)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=method)


def test_sharded_bounded_warp_channels_and_big_z_shift():
    from neurite_tpu.parallel import halo, mesh as pmesh
    from neurite_tpu.utils import spatial

    mesh = pmesh.create_mesh(data=1, space=2)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(1, 12, 8, 8, 2)), jnp.float32)
    # includes cross-shard reads: z displacement up to 3 crosses the
    # shard boundary rows
    shift = jnp.asarray(rng.uniform(-3., 3., size=(1, 12, 8, 8, 3)),
                        jnp.float32)
    want = spatial.batch_transform(vol, shift, fill_value=0.,
                                   impl='onehot', max_disp=4.0)
    got = halo.sharded_bounded_warp(vol, shift, mesh, max_disp=4.0,
                                    fill_value=0.)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_lc_matches_unsharded(mesh):
    """Spatially-sharded LC head (parallel.sharded_lc): z-sharded volume +
    z-sharded per-voxel weights, halo exchange only — fwd AND grads must
    match the single-device transposed tap sum (ops/lc_tap.py)."""
    from neurite_tpu.ops import lc_tap

    B, D, H, W, C, O = 2, 16, 6, 6, 3, 1
    ks = (3, 3, 3)
    tc = int(np.prod(ks)) * C
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(O, tc, D * H * W)) * 0.1,
                       jnp.float32)
    want = lc_tap.lc_transposed(x, kern, ks, 'same')

    from neurite_tpu import parallel
    k4 = kern.reshape(O, tc, D, H * W)
    got = parallel.sharded_lc(x, k4, ks, mesh)
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, -1, O), np.asarray(want).reshape(B, -1, O),
        atol=1e-5)

    # gradients: dx crosses shard boundaries (transposed ppermute), dk is
    # produced on the owning shard
    g = jnp.asarray(rng.normal(size=want.shape), jnp.float32)

    def loss_ref(xx, kk):
        return jnp.sum(lc_tap.lc_transposed(xx, kk, ks, 'same') * g)

    def loss_sh(xx, kk):
        y = parallel.sharded_lc(xx, kk.reshape(O, tc, D, H * W), ks, mesh)
        return jnp.sum(y * g.reshape(y.shape))

    dxr, dkr = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    dxs, dks = jax.grad(loss_sh, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(dxs), np.asarray(dxr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dks), np.asarray(dkr), atol=1e-4)


def test_sharded_lc_pallas_impl_matches_tap(mesh):
    """sharded_lc(impl='pallas') — the v2 Pallas kernel per shard with its
    V axis sharded by construction (the multi-device route around the
    160^3 pure-XLA compile crash, docs/DESIGN.md) — must match the tap
    form exactly (interpret mode on the CPU mesh)."""
    from neurite_tpu import parallel

    B, D, H, W, C, O = 1, 16, 8, 8, 2, 1
    ks = (3, 3, 3)
    tc = int(np.prod(ks)) * C
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    k4 = jnp.asarray(rng.normal(size=(O, tc, D, H * W)) * 0.1, jnp.float32)
    want = parallel.sharded_lc(x, k4, ks, mesh, impl='tap')
    got = parallel.sharded_lc(x, k4, ks, mesh, impl='pallas',
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g = jnp.asarray(rng.normal(size=np.shape(want)), jnp.float32)

    def loss(kk, impl, interp):
        y = parallel.sharded_lc(x, kk, ks, mesh, impl=impl, interpret=interp)
        return jnp.sum(y * g)

    dk_tap = jax.grad(lambda kk: loss(kk, 'tap', False))(k4)
    dk_pal = jax.grad(lambda kk: loss(kk, 'pallas', True))(k4)
    np.testing.assert_allclose(np.asarray(dk_pal), np.asarray(dk_tap),
                               atol=1e-4)


@pytest.mark.slow
def test_sharded_lc_head_scale_160(mesh):
    """Head-scale smoke (VERDICT r4 #5): the 160^3 config-#3 LC head runs
    z-sharded across the mesh — fwd + grads finite, shard shapes right.
    (The single-device pure-XLA 160^3 step crashes the TPU pool's remote
    compiler; per-shard programs are the compiling form.)"""
    from neurite_tpu import parallel

    D, C, O = 160, 2, 1
    ks = (3, 3, 3)
    tc = int(np.prod(ks)) * C
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(1, D, D, D, C)).astype(np.float32))
    k4 = jnp.asarray(
        (r.normal(size=(O, tc, D, D * D)) * 0.02).astype(np.float32))

    def loss(kk):
        y = parallel.sharded_lc(x, kk, ks, mesh)
        return jnp.mean(y ** 2)

    lval, dk = jax.value_and_grad(loss)(k4)
    assert np.isfinite(float(lval))
    assert dk.shape == k4.shape
    assert np.isfinite(np.asarray(dk[:, :, ::37, ::53])).all()
