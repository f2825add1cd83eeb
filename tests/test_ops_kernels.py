"""
Parity tests for the neurite_tpu.ops performance layer against the pure-jnp
reference implementations (SURVEY.md §4 item 1: every kernel is gated by a
numerical-parity test vs the reference formulation).

Pallas kernels run in interpret mode here (CPU test box); the same code path
compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne
from neurite_tpu import ops
from neurite_tpu.utils import core


rng = np.random.default_rng(7)


# ---------------------------------------------------------------- resize_mm
@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('shape,new_shape', [
    ((9, 11), (17, 5)),
    ((6, 7, 8), (12, 14, 16)),
    ((12, 14, 16), (6, 7, 9)),
    ((5, 5, 5), (5, 9, 5)),       # identity axis skipped
])
def test_resize_separable_matches_interpn(method, shape, new_shape):
    vol = jnp.asarray(rng.normal(size=shape + (2,)), jnp.float32)
    lin = [jnp.linspace(0., shape[d] - 1., new_shape[d])
           for d in range(len(shape))]
    grid = core.ndgrid(*lin)
    want = core.interpn(vol, grid, interp_method=method)
    for impl in ('take', 'matmul'):
        got = ops.resize_separable(vol, new_shape, method=method, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=impl)


def test_resize_separable_int_input():
    vol = jnp.asarray(rng.integers(0, 9, size=(6, 6)), jnp.int32)
    got = ops.resize_separable(vol, (12, 12), method='nearest')
    lin = [jnp.linspace(0., 5., 12)] * 2
    want = core.interpn(vol.astype(jnp.float32), core.ndgrid(*lin),
                        interp_method='nearest')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_utils_resize_uses_separable_path():
    """utils.resize output must stay identical after rewiring onto ops."""
    vol = jnp.asarray(rng.normal(size=(7, 9, 4)), jnp.float32)
    out = core.resize(vol, [2.0, 0.5])
    assert out.shape == (14, 4, 4)
    # oracle: direct interpn on the same grid
    lin = [jnp.linspace(0., 6., 14), jnp.linspace(0., 8., 4)]
    want = core.interpn(vol, core.ndgrid(*lin))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


# ---------------------------------------------------------------- warp cube
@pytest.mark.parametrize('nd', [2, 3])
@pytest.mark.parametrize('fill', [None, 0.0])
def test_interpn_cube_matches_interpn(nd, fill):
    shape = (7, 9, 6)[:nd]
    vol = jnp.asarray(rng.normal(size=shape + (3,)), jnp.float32)
    # locations including out-of-bounds on both sides
    loc = jnp.asarray(
        rng.uniform(-2, max(shape) + 2, size=(11, 13, nd)), jnp.float32)
    want = core.interpn(vol, loc, interp_method='linear', fill_value=fill)
    got = ops.interpn_cube(vol, loc, interp_method='linear', fill_value=fill)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_cube_no_channel_and_list_loc():
    vol = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    locs = [jnp.asarray(rng.uniform(0, 7, size=(5, 5)), jnp.float32)
            for _ in range(2)]
    want = core.interpn(vol, locs)
    got = ops.interpn_cube(vol, locs)
    assert got.shape == want.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ---------------------------------------------------------------- mi_hist
def test_mi_histograms_pallas_matches_jnp():
    bs, n_vox, nb_bins = 2, 1000, 16   # non-multiple of chunk to hit masking
    x = jnp.asarray(rng.uniform(0, 1, size=(bs, n_vox)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, size=(bs, n_vox)), jnp.float32)
    centers = jnp.linspace(0., 1., nb_bins)
    alpha = 150.0
    want = ops.mi_histograms(x, y, centers, alpha, impl='jnp')
    got = ops.mi_histograms(x, y, centers, alpha, impl='pallas',
                            interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-4)


def test_mi_histograms_clip():
    x = jnp.asarray(rng.uniform(-1, 2, size=(1, 700)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 2, size=(1, 700)), jnp.float32)
    centers = jnp.linspace(0., 1., 8)
    want = ops.mi_histograms(x, y, centers, 40., min_clip=0., max_clip=1.,
                             impl='jnp')
    got = ops.mi_histograms(x, y, centers, 40., min_clip=0., max_clip=1.,
                            impl='pallas', interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-4)


def test_mi_metric_fused_path_matches_maps():
    """MutualInformation.volumes via fused histograms == reference maps path."""
    mi = ne.metrics.MutualInformation(nb_bins=8, min_clip=0., max_clip=1.)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 6, 6, 6, 1)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, size=(2, 6, 6, 6, 1)), jnp.float32)
    want = mi.volumes(x, y)
    got = mi.volumes_fused(x, y, impl='jnp')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    got_p = mi.volumes_fused(x, y, impl='pallas', interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- dice_red
def test_dice_sums_pallas_matches_jnp():
    bs, n_vox, nb_labels = 2, 900, 4
    x = jnp.asarray(rng.uniform(0, 1, size=(bs, n_vox, nb_labels)),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, size=(bs, n_vox, nb_labels)),
                    jnp.float32)
    want = ops.dice_sums(x, y, impl='jnp')
    got = ops.dice_sums(x, y, impl='pallas', interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-4)


def test_dice_metric_unchanged_by_kernel():
    """Dice.dice with the fused path equals the plain jnp formula."""
    nb_labels = 3
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 5, 5, nb_labels)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, size=(2, 5, 5, nb_labels)), jnp.float32)
    d = ne.metrics.Dice(check_input_limits=False)
    want = d.dice(x, y)
    sums = ops.dice_sums(x.reshape(2, -1, nb_labels),
                         y.reshape(2, -1, nb_labels), impl='pallas',
                         interpret=True)
    top = 2. * sums[0]
    bottom = sums[1] + sums[2]
    got = top / jnp.maximum(bottom, 1e-7)  # div_no_nan-equivalent for y!=0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- warp rows
@pytest.mark.parametrize('channels', [None, 1, 3])
@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('fill', [None, 0.0])
def test_interpn_rows_matches_generic(channels, method, fill):
    shape = (10, 9, 8) + (() if channels is None else (channels,))
    vol = jnp.asarray(rng.normal(size=shape), jnp.float32)
    loc = jnp.asarray(rng.uniform(-4, 14, size=(6, 5, 4, 3)), jnp.float32)
    # pin exact integers and corners
    loc = loc.at[0, 0, 0].set(jnp.asarray([9., 8., 7.]))
    loc = loc.at[0, 0, 1].set(jnp.asarray([0., 0., 0.]))
    loc = loc.at[0, 1, 0].set(jnp.asarray([3., 4., 5.]))
    want = core.interpn(vol, loc, interp_method=method, fill_value=fill,
                        impl='gather')
    got = ops.interpn_rows(vol, loc, interp_method=method, fill_value=fill)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # the default interpn dispatch must take the rows path and agree too
    auto = core.interpn(vol, loc, interp_method=method, fill_value=fill)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(want), atol=1e-5)


def test_interpn_rows_gradient():
    vol = jnp.asarray(rng.normal(size=(6, 6, 6, 2)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 5, size=(4, 4, 4, 3)), jnp.float32)

    def f_rows(v, l):
        return jnp.sum(ops.interpn_rows(v, l) ** 2)

    def f_gen(v, l):
        return jnp.sum(core.interpn(v, l, impl='gather') ** 2)

    gv_r, gl_r = jax.grad(f_rows, argnums=(0, 1))(vol, loc)
    gv_g, gl_g = jax.grad(f_gen, argnums=(0, 1))(vol, loc)
    np.testing.assert_allclose(np.asarray(gv_r), np.asarray(gv_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_r), np.asarray(gl_g), atol=1e-4)
