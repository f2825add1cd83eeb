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
from neurite_tpu.utils import core, spatial


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


# -------------------------------------------------------------- warp onehot
@pytest.mark.parametrize('channels', [None, 2])
@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('fill', [None, 0.0])
def test_interpn_onehot_matches_generic(channels, method, fill):
    shape = (10, 9, 8) + (() if channels is None else (channels,))
    vol = jnp.asarray(rng.normal(size=shape), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((6, 5, 8)), -1).astype(
        jnp.float32)
    # bounded displacements plus out-of-range points on both sides
    loc = base + jnp.asarray(rng.uniform(-2.5, 2.5, size=(6, 5, 8, 3)),
                             jnp.float32)
    loc = loc.at[0, 0, 0].set(jnp.asarray([-3., -3., -3.]))
    loc = loc.at[0, 0, 1].set(jnp.asarray([12., 11., 10.]))   # beyond top
    loc = loc.at[0, 1, 0].set(jnp.asarray([9., 8., 7.]))      # exact corner
    loc = loc.at[1, 0, 0].set(jnp.asarray([3., 4., 5.]))      # exact interior
    want = core.interpn(vol, loc, interp_method=method, fill_value=fill,
                        impl='gather')
    got = ops.interpn_onehot(vol, loc, interp_method=method, fill_value=fill,
                             max_disp=3.0, block=(4, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    via_interpn = core.interpn(vol, loc, interp_method=method,
                               fill_value=fill, impl='onehot', max_disp=3.0,
                               block=(4, 4))
    np.testing.assert_allclose(np.asarray(via_interpn), np.asarray(want),
                               atol=1e-5)


def test_interpn_onehot_large_translation_exact():
    """Dynamic per-block windows absorb global shifts far beyond max_disp."""
    vol = jnp.asarray(rng.normal(size=(16, 16, 12)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((16, 16, 12)), -1).astype(
        jnp.float32)
    shift = jnp.asarray([7.3, -5.2, 2.1], jnp.float32)   # >> max_disp=1
    loc = base + shift + jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(16, 16, 12, 3)), jnp.float32)
    want = core.interpn(vol, loc, impl='gather')
    got = ops.interpn_onehot(vol, loc, max_disp=1.0, block=(4, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_onehot_int_labels_nearest():
    labels = jnp.asarray(rng.integers(0, 9, size=(8, 8, 8)), jnp.int32)
    base = jnp.stack(core.volshape_to_ndgrid((8, 8, 8)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-1.5, 1.5, size=(8, 8, 8, 3)),
                             jnp.float32)
    want = core.interpn(labels.astype(jnp.float32), loc,
                        interp_method='nearest', impl='gather')
    got = ops.interpn_onehot(labels, loc, interp_method='nearest',
                             max_disp=2.0, block=(4, 4))
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want).astype(np.int32))


def test_interpn_onehot_batched_matches_per_item():
    vols = jnp.asarray(rng.normal(size=(3, 9, 8, 8, 2)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((9, 8, 8)), -1).astype(
        jnp.float32)
    locs = base + jnp.asarray(rng.uniform(-2, 2, size=(3, 9, 8, 8, 3)),
                              jnp.float32)
    got = ops.interpn_onehot(vols, locs, max_disp=2.0, block=(4, 4))
    for b in range(3):
        want = core.interpn(vols[b], locs[b], impl='gather')
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=1e-5)


@pytest.mark.parametrize('method', ['linear', 'nearest'])
def test_interpn_onehot_xtiled_matches_generic(method):
    """(bz, by, bx) blocks: 3-D dynamic windows, incl. non-divisible x."""
    vol = jnp.asarray(rng.normal(size=(12, 10, 11, 2)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((12, 10, 11)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-2.5, 2.5, size=(12, 10, 11, 3)),
                             jnp.float32)
    loc = loc.at[0, 0, 0].set(jnp.asarray([-3., -3., -3.]))     # oob low
    loc = loc.at[0, 0, 1].set(jnp.asarray([14., 12., 13.]))     # oob high
    want = core.interpn(vol, loc, interp_method=method, fill_value=0.,
                        impl='gather')
    got = ops.interpn_onehot(vol, loc, interp_method=method, fill_value=0.,
                             max_disp=3.0, block=(4, 4, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_onehot_xtiled_large_translation_exact():
    """3-D windows absorb big global shifts along x too."""
    vol = jnp.asarray(rng.normal(size=(16, 12, 16)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((16, 12, 16)), -1).astype(
        jnp.float32)
    shift = jnp.asarray([-4.2, 3.1, 6.7], jnp.float32)
    loc = base + shift + jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(16, 12, 16, 3)), jnp.float32)
    want = core.interpn(vol, loc, impl='gather')
    got = ops.interpn_onehot(vol, loc, max_disp=1.0, block=(4, 4, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_onehot_bf16_nearest_exact_for_labels():
    """bf16 matmuls stay exact for 0/1 weights over integer label values."""
    labels = jnp.asarray(rng.integers(0, 250, size=(8, 8, 8)), jnp.int32)
    base = jnp.stack(core.volshape_to_ndgrid((8, 8, 8)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-1.9, 1.9, size=(8, 8, 8, 3)),
                             jnp.float32)
    want = core.interpn(labels.astype(jnp.float32), loc,
                        interp_method='nearest', impl='gather')
    for block in ((4, 4), (4, 4, 4)):
        got = ops.interpn_onehot(labels, loc, interp_method='nearest',
                                 max_disp=2.0, block=block,
                                 matmul_dtype=jnp.bfloat16)
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want).astype(np.int32))


def test_interpn_onehot_gradient():
    vol = jnp.asarray(rng.normal(size=(6, 6, 6, 2)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((6, 6, 6)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-1, 1, size=(6, 6, 6, 3)),
                             jnp.float32)
    # keep away from integer lattice points where lerp grads are one-sided
    loc = jnp.clip(jnp.round(loc) + 0.4, 0.4, 4.6)

    def f_oh(v, l):
        return jnp.sum(ops.interpn_onehot(v, l, max_disp=2., block=(3, 3))
                       ** 2)

    def f_gen(v, l):
        return jnp.sum(core.interpn(v, l, impl='gather') ** 2)

    gv_o, gl_o = jax.grad(f_oh, argnums=(0, 1))(vol, loc)
    gv_g, gl_g = jax.grad(f_gen, argnums=(0, 1))(vol, loc)
    np.testing.assert_allclose(np.asarray(gv_o), np.asarray(gv_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_o), np.asarray(gl_g), atol=1e-4)


def test_integrate_vec_onehot_matches_default():
    from neurite_tpu.utils import spatial
    vel = jnp.asarray(rng.normal(size=(12, 12, 12, 3)), jnp.float32) * 0.8
    want = spatial.integrate_vec(vel, nb_steps=5)
    got = spatial.integrate_vec(vel, nb_steps=5, impl='onehot', max_disp=3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_batch_transform_onehot_matches_default():
    from neurite_tpu.utils import spatial
    vols = jnp.asarray(rng.normal(size=(2, 10, 9, 8, 1)), jnp.float32)
    shifts = jnp.asarray(rng.uniform(-2, 2, size=(2, 10, 9, 8, 3)),
                         jnp.float32)
    want = spatial.batch_transform(vols, shifts, interp_method='nearest',
                                   fill_value=0)
    got = spatial.batch_transform(vols, shifts, interp_method='nearest',
                                  fill_value=0, impl='onehot', max_disp=2.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_compose_affine_dense_matches_gather_compose():
    """Closed-form affine∘dense composition vs the dense gather path,
    including boundary clamping (large shifts push points out of range)."""
    from neurite_tpu.utils import spatial
    shape = (10, 9, 8)
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] += np.random.default_rng(0).normal(size=(3, 3)) * 0.1
    mat[:3, 3] = [3.5, -2.2, 1.1]
    mat = jnp.asarray(mat)
    dense = jnp.asarray(
        np.random.default_rng(1).normal(size=shape + (3,)) * 2.5, jnp.float32)
    dense_aff = spatial.affine_to_dense_shift(mat[:3], shape,
                                              shift_center=False)
    want = spatial.compose_transforms([dense_aff, dense], shape=shape,
                                      shift_center=False)
    got = spatial.compose_affine_dense(mat[:3], dense, shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


# -------------------------------------------------------------- fused blur
class TestFusedBlur:
    def _oracle(self, x, ks, axis):
        return core.separable_conv(x, ks, axis=axis, batched=True)

    @pytest.mark.parametrize('widths', [(5, 3, 7), (1, 3, 1), (9, 9, 9)])
    def test_parity_vs_separable_conv(self, widths):
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(2, 16, 12, 24, 2)), jnp.float32)
        ks = [jnp.asarray(r.uniform(0.1, 1, w), jnp.float32) for w in widths]
        want = self._oracle(x, ks, axis=[0, 1, 2])
        # drive the pallas kernel directly (interpret mode on CPU) on the
        # merged batch*channel layout separable_conv would hand it
        xm = jnp.moveaxis(x, -1, 1).reshape(4, 16, 12, 24)
        got = ops.separable_blur3d(xm, ks, impl='pallas', interpret=True)
        got = jnp.moveaxis(got.reshape(2, 2, 16, 12, 24), 1, -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_axis_subset_and_identity(self):
        r = np.random.default_rng(2)
        x = jnp.asarray(r.normal(size=(1, 8, 8, 16, 1)), jnp.float32)
        k = jnp.asarray(r.uniform(0.1, 1, 5), jnp.float32)
        want = self._oracle(x, [k], axis=[1])
        xm = x[..., 0]
        got = ops.separable_blur3d(
            xm, (jnp.ones(1), k, jnp.ones(1)), impl='pallas',
            interpret=True)[..., None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_grad_matches_xla_path(self):
        from neurite_tpu.ops import blur as blur_ops
        r = np.random.default_rng(3)
        x = jnp.asarray(r.normal(size=(1, 8, 8, 16)), jnp.float32)
        ks = [jnp.asarray(r.uniform(0.1, 1, w), jnp.float32)
              for w in (3, 5, 3)]

        def f_p(x, *ks):
            return jnp.sum(blur_ops._blur3d_ad(x, *ks, True) ** 2)

        def f_j(x, *ks):
            return jnp.sum(blur_ops._blur3d_jnp(x, *ks) ** 2)

        gp = jax.grad(f_p, argnums=(0, 1, 2, 3))(x, *ks)
        gj = jax.grad(f_j, argnums=(0, 1, 2, 3))(x, *ks)
        for a, b in zip(gp, gj):
            scale = max(1., float(jnp.abs(b).max()))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=1e-5)

    def test_supported_envelope(self):
        from neurite_tpu.ops import blur as blur_ops
        assert blur_ops.supported((1, 128, 128, 128), (7, 7, 7), jnp.float32)
        assert not blur_ops.supported((1, 128, 128, 128), (8, 7, 7),
                                      jnp.float32)       # even width
        # z window larger than the volume depth
        assert not blur_ops.supported((1, 7, 8, 8), (17, 7, 7), jnp.float32)
        assert not blur_ops.supported((1, 128, 128), (7, 7), jnp.float32)


# ------------------------------------------------------- shear onehot engine
class TestShearOnehot:
    def _affine(self, rot_deg, scale, shear, shift, key):
        r = np.random.default_rng(key)
        par = np.concatenate([
            r.uniform(-shift, shift, 3),
            r.uniform(-rot_deg, rot_deg, 3),
            r.uniform(-scale, scale, 3),
            r.uniform(-shear, shear, 3)])
        m = spatial.params_to_affine_matrix(par=jnp.asarray(par), ndims=3,
                                            deg=True, shift_scale=True,
                                            last_row=True)
        return np.asarray(m)

    def _run(self, rot, scale, shear, shift, dense_amp, shape=(18, 16, 16)):
        from neurite_tpu.ops import warp as warp_ops
        from scipy import ndimage
        r = np.random.default_rng(0)
        labels = jnp.asarray(r.integers(0, 200, size=(2, *shape)), jnp.int32)
        grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32)
                                      for s in shape], indexing='ij'), -1)
        locs, mats = [], []
        for b in range(2):
            A = self._affine(rot, scale, shear, shift, b + 1)
            # rotate about the volume center so samples stay mostly in range
            ctr = (np.asarray(shape, np.float32) - 1) / 2
            aff = grid @ A[:3, :3].T + (A[:3, 3] + ctr - ctr @ A[:3, :3].T)
            d = r.normal(size=(*shape, 3)).astype(np.float32)
            for c in range(3):
                d[..., c] = ndimage.gaussian_filter(d[..., c], 3)
            if np.abs(d).max() > 0:
                d *= dense_amp / np.abs(d).max()
            locs.append(aff + d)
            mats.append(A)
        loc = jnp.asarray(np.stack(locs))
        mats = jnp.asarray(np.stack(mats))
        want = jnp.stack([
            core.interpn(labels[b].astype(jnp.float32), loc[b],
                         interp_method='nearest', fill_value=0.,
                         impl='gather') for b in range(2)])
        md = warp_ops.shear_window_disp((4, 4), rot, scale, shear, dense_amp)
        ms = warp_ops.shear_bound(rot, scale, shear)
        got = warp_ops.interpn_shear_onehot(
            labels, mats, loc, max_disp=md, max_shear=ms, block=(4, 4),
            fill_value=0, matmul_dtype=jnp.bfloat16)
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want).astype(np.int32))

    def test_rotation_scale_shear_exact(self):
        self._run(rot=12., scale=0.1, shear=0.05, shift=2., dense_amp=2.)

    def test_pure_translation_exact(self):
        self._run(rot=0., scale=0., shear=0., shift=5., dense_amp=1.5)

    def test_strong_rotation_exact(self):
        self._run(rot=25., scale=0.15, shear=0.1, shift=1., dense_amp=1.)


def test_interpn_onehot_bf16x2_linear_accuracy():
    """Split-float matmuls land at ~1e-5 relative of the f32 gather path
    (the lo component is itself bf16-rounded, so the recovered precision is
    ~2^-17 per operand) — half the MXU passes of f32/HIGHEST; opt-in only,
    since 1e-5 is the framework's parity bound, not comfortably inside it."""
    vol = jnp.asarray(rng.normal(size=(10, 9, 12, 3)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((10, 9, 12)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-2.5, 2.5, size=(10, 9, 12, 3)),
                             jnp.float32)
    want = core.interpn(vol, loc, interp_method='linear', fill_value=0.,
                        impl='gather')
    got = ops.interpn_onehot(vol, loc, interp_method='linear', fill_value=0.,
                             max_disp=3.0, block=(4, 4),
                             matmul_dtype='bf16x2')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 1e-4, err


# ------------------------------------------------------ unbounded window warp
@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('fill', [None, 0.0])
def test_interpn_window_smooth_field_fast_path(method, fill):
    """Smooth bounded field: spread guard passes, engine path is exact."""
    vol = jnp.asarray(rng.normal(size=(12, 11, 10, 2)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((12, 11, 10)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-2., 2., size=(12, 11, 10, 3)),
                             jnp.float32)
    assert bool(ops.block_spread_ok(loc[None], (12, 11, 10), method,
                                    (4, 4, 4), 4))
    want = core.interpn(vol, loc, interp_method=method, fill_value=fill)
    got = ops.interpn_window(vol, loc, interp_method=method, fill_value=fill,
                             block=(4, 4, 4), window_pad=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_window_adversarial_fallback_exact():
    """White-noise amplitude >> window: guard trips, gather fallback exact."""
    vol = jnp.asarray(rng.normal(size=(16, 16, 16)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((16, 16, 16)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-9., 9., size=(16, 16, 16, 3)),
                             jnp.float32)
    assert not bool(ops.block_spread_ok(loc[None], (16, 16, 16), 'linear',
                                        (4, 4, 4), 3))
    want = core.interpn(vol, loc, fill_value=0.)
    got = jax.jit(lambda v, l: ops.interpn_window(
        v, l, fill_value=0., block=(4, 4, 4), window_pad=3))(vol, loc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_window_translation_unbounded_exact():
    """Global translation far beyond the window: dynamic starts absorb it."""
    vol = jnp.asarray(rng.normal(size=(16, 14, 12)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((16, 14, 12)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray([9.3, -6.2, 5.1], jnp.float32)
    assert bool(ops.block_spread_ok(loc[None], (16, 14, 12), 'linear',
                                    (4, 4, 4), 3))
    want = core.interpn(vol, loc, fill_value=0.)
    got = ops.interpn_window(vol, loc, fill_value=0., block=(4, 4, 4),
                             window_pad=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_window_batched_and_via_interpn():
    vols = jnp.asarray(rng.normal(size=(2, 10, 10, 10, 1)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((10, 10, 10)), -1).astype(
        jnp.float32)
    locs = jnp.stack([base + 3.7, base - 2.2])
    want = jnp.stack([core.interpn(vols[i], locs[i], fill_value=0.)
                      for i in range(2)])
    got = ops.interpn_window(vols, locs, fill_value=0., block=(4, 4, 4),
                             window_pad=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    via = core.interpn(vols[0, ..., 0], locs[0], fill_value=0.,
                       impl='window', max_disp=2.0, block=(4, 4, 4))
    np.testing.assert_allclose(np.asarray(via), np.asarray(want[0, ..., 0]),
                               atol=1e-5)


# ----------------------------------------------------- pallas windowed warp
@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('fill', [None, 0.0])
def test_interpn_pallas_matches_generic(method, fill):
    from neurite_tpu.ops import pallas_warp
    vol = jnp.asarray(rng.normal(size=(12, 10, 128)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((12, 10, 128)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-2.5, 2.5, size=(12, 10, 128, 3)),
                             jnp.float32)
    want = core.interpn(vol, loc, interp_method=method, fill_value=fill)
    got = pallas_warp.interpn_pallas(vol, loc, interp_method=method,
                                     fill_value=fill, max_disp=3.0,
                                     block=(4, 5), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_pallas_translation_and_batch():
    # v1 contract: dynamic window starts absorb global z/y translations
    # (the v2 kernel's windows are static — translations route to the
    # gather fallback via `disp_ok`, tested below)
    from neurite_tpu.ops import pallas_warp
    vol = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((16, 16, 128)), -1).astype(
        jnp.float32)
    locs = jnp.stack([base + 7.3, base - 5.1])
    want = jnp.stack([core.interpn(vol[i], locs[i], fill_value=0.)
                      for i in range(2)])
    got = pallas_warp.interpn_pallas(vol, locs, fill_value=0., max_disp=2.0,
                                     interpret=True, version='v1')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize('method', ['linear', 'nearest'])
@pytest.mark.parametrize('block', [(1, 8), (2, 8), (4, 8)])
def test_interpn_pallas_v2_parity(method, block):
    # v2 (static sheared windows + lane-gather x taps): exact for
    # displacement-bounded fields, batched, with fill_value
    from neurite_tpu.ops import pallas_warp
    vol = jnp.asarray(rng.normal(size=(2, 20, 20, 128)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((20, 20, 128)), -1).astype(
        jnp.float32)
    locs = base[None] + jnp.asarray(
        rng.uniform(-3, 3, size=(2, 20, 20, 128, 3)), jnp.float32)
    want = jnp.stack([core.interpn(vol[i], locs[i], interp_method=method,
                                   fill_value=0.) for i in range(2)])
    got = pallas_warp.interpn_pallas(vol, locs, interp_method=method,
                                     fill_value=0., max_disp=3.0,
                                     block=block, interpret=True,
                                     version='v2')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize('method', ['linear', 'nearest'])
def test_interpn_pallas_v2_wide_lanes(method):
    # W > 128 rides v2's panel-split lane gathers (r4): parity at W=160
    from neurite_tpu.ops import pallas_warp
    vol = jnp.asarray(rng.normal(size=(12, 12, 160)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((12, 12, 160)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-3, 3, size=(12, 12, 160, 3)),
                             jnp.float32)
    want = core.interpn(vol, loc, interp_method=method, fill_value=0.)
    got = pallas_warp.interpn_pallas(vol, loc, interp_method=method,
                                     fill_value=0., max_disp=3.0,
                                     block=(2, 4), interpret=True,
                                     version='v2')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_interpn_window_guard_none():
    # guard='none' skips the runtime check: bounded fields stay exact,
    # and the lax.cond/fallback disappears from the program
    from neurite_tpu.ops import warp as warp_ops
    vol = jnp.asarray(rng.normal(size=(12, 10, 128)), jnp.float32)
    base = jnp.stack(core.volshape_to_ndgrid((12, 10, 128)), -1).astype(
        jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-2, 2, size=(12, 10, 128, 3)),
                             jnp.float32)
    want = core.interpn(vol, loc, fill_value=0.)
    got = warp_ops.interpn_window(vol, loc, fill_value=0., window_pad=3,
                                  block=(4, 4, 4), engine='xla',
                                  guard='none')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    via = core.interpn(vol, loc, fill_value=0., impl='window', max_disp=2.0,
                       block=(4, 4, 4), guard='none')
    np.testing.assert_allclose(np.asarray(via), np.asarray(want), atol=1e-5)
    # no cond branch in the lowered program when the guard is off
    # (lax.cond lowers to a stablehlo `case`)
    txt = jax.jit(lambda v, l: warp_ops.interpn_window(
        v, l, fill_value=0., window_pad=3, block=(4, 4, 4), engine='xla',
        guard='none')).lower(vol, loc).as_text()
    assert 'case' not in txt


def test_interpn_pallas_v2_disp_guard():
    # the v2 displacement guard: bounded fields pass, translations and
    # spiky fields fail (and interpn_window then takes the exact fallback)
    from neurite_tpu.ops import warp as warp_ops
    shape = (16, 16, 128)
    base = jnp.stack(core.volshape_to_ndgrid(shape), -1).astype(jnp.float32)
    ok = warp_ops.disp_ok(
        (base + jnp.asarray(rng.uniform(-3, 3, size=shape + (3,)),
                            jnp.float32))[None], shape, 'linear', 3)
    assert bool(ok)
    bad = warp_ops.disp_ok((base + jnp.asarray([7., 0., 0.]))[None],
                           shape, 'linear', 3)
    assert not bool(bad)
    # out-of-bounds loc clips INTO the window: still exact -> guard passes
    edge = base.at[..., 0].add(-2.5)  # dz in [-2.5, 0] after clip
    assert bool(warp_ops.disp_ok(edge[None], shape, 'linear', 3))


# ---------------------------------------------------------------------------
# max_pool with custom first-max backward (ops/pool.py): replaces XLA's
# select_and_scatter lowering (measured 14ms of the 54ms UNet-128^3 step)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('shape,win', [
    ((2, 8, 8, 3), (2, 2)),
    ((1, 8, 10, 6, 4), (2, 2, 2)),
    ((1, 9, 3), (3,)),
])
def test_max_pool_matches_stock_fwd_bwd(shape, win):
    import flax.linen as nn
    from neurite_tpu.ops.pool import max_pool
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    want = nn.max_pool(x, window_shape=win, strides=win, padding='VALID')
    got = max_pool(x, win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    gw = jax.grad(lambda x: jnp.sum(nn.max_pool(
        x, window_shape=win, strides=win, padding='VALID') ** 2))(x)
    gg = jax.grad(lambda x: jnp.sum(max_pool(x, win) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=1e-6)


def test_max_pool_tie_break_first_max():
    # duplicated maxima: gradient must route to the FIRST element of the
    # window (select_and_scatter / keras MaxPooling semantics)
    import flax.linen as nn
    from neurite_tpu.ops.pool import max_pool
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    gw = jax.grad(lambda x: jnp.sum(nn.max_pool(
        x, window_shape=(2, 2), strides=(2, 2), padding='VALID')))(x)
    gg = jax.grad(lambda x: jnp.sum(max_pool(x, (2, 2))))(x)
    np.testing.assert_array_equal(np.asarray(gg), np.asarray(gw))


def test_max_pool_fallback_non_divisible():
    from neurite_tpu.ops.pool import max_pool
    x = jnp.asarray(rng.normal(size=(1, 7, 3)), jnp.float32)
    assert max_pool(x, (2,), padding='VALID').shape == (1, 3, 3)


# ---------------------------------------------------------------------------
# Pallas locally-connected kernel (ops/pallas_lc.py) — interpret mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('shape3,C,ks', [
    ((6, 8, 8), 3, (3, 3, 3)),
    ((4, 8, 16), 1, (3, 3, 3)),
    ((8, 8, 8), 2, (3, 1, 3)),
])
def test_lc3d_pallas_matches_per_tap(shape3, C, ks):
    from neurite_tpu.layers.local import _lc_per_tap
    from neurite_tpu.ops import pallas_lc
    D, H, W = shape3
    V = D * H * W
    K = int(np.prod(ks)) * C
    x = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(V, K)), jnp.float32)

    want, _ = _lc_per_tap(x.reshape(1, D, H, W, C), k2.reshape(V, K, 1),
                          ks, (1, 1, 1), 'same', 1)
    want = want.reshape(V, 1)
    got = pallas_lc.lc3d_pallas(x, k2, shape3, ks, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_lc3d_pallas_gradients():
    from neurite_tpu.layers.local import _lc_per_tap
    from neurite_tpu.ops import pallas_lc
    D, H, W, C = 6, 8, 8, 3
    ks = (3, 3, 3)
    V, K = D * H * W, 27 * C
    x = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(V, K)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(V, 1)), jnp.float32)

    def loss_ref(x, k2):
        y, _ = _lc_per_tap(x.reshape(1, D, H, W, C), k2.reshape(V, K, 1),
                           ks, (1, 1, 1), 'same', 1)
        return jnp.sum(y.reshape(V, 1) * g)

    def loss_pal(x, k2):
        return jnp.sum(pallas_lc.lc3d_pallas(x, k2, (D, H, W), ks, True) * g)

    dr = jax.grad(loss_ref, argnums=(0, 1))(x, k2)
    dp = jax.grad(loss_pal, argnums=(0, 1))(x, k2)
    np.testing.assert_allclose(np.asarray(dp[0]), np.asarray(dr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp[1]), np.asarray(dr[1]),
                               atol=1e-5, rtol=1e-5)


def test_lc3d_pallas_supported_gate():
    from neurite_tpu.ops import pallas_lc
    ok = pallas_lc.supported((1, 8, 8, 8, 3), (3, 3, 3), 1, (1, 1, 1), 'same')
    assert ok
    # rejects: multi-filter, even kernel, valid padding, wide channels
    assert not pallas_lc.supported((1, 8, 8, 8, 3), (3, 3, 3), 2,
                                   (1, 1, 1), 'same')
    assert not pallas_lc.supported((1, 8, 8, 8, 3), (2, 3, 3), 1,
                                   (1, 1, 1), 'same')
    assert not pallas_lc.supported((1, 8, 8, 8, 3), (3, 3, 3), 1,
                                   (1, 1, 1), 'valid')
    assert not pallas_lc.supported((1, 8, 8, 8, 32), (3, 3, 3), 1,
                                   (1, 1, 1), 'same')


def test_lc3d_pallas_bf16_kernel_grads():
    # bf16 params: dk must come back bf16 and match the f32 path to bf16
    # rounding; dx accumulates in f32 (same contract as the forward)
    from neurite_tpu.ops import pallas_lc
    D, H, W, C = 4, 8, 8, 2
    ks = (3, 3, 3)
    V, K = D * H * W, 27 * C
    x = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(V, K)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(V, 1)), jnp.float32)

    def loss(x, k2):
        return jnp.sum(pallas_lc.lc3d_pallas(x, k2, (D, H, W), ks, True) * g)

    dx, dk = jax.grad(loss, argnums=(0, 1))(x, k2)
    assert dk.dtype == jnp.bfloat16 and dx.dtype == jnp.float32

    k2f = k2.astype(jnp.float32)

    def loss_f(x, k2f):
        return jnp.sum(pallas_lc.lc3d_pallas(x, k2f, (D, H, W), ks, True) * g)

    dxf, dkf = jax.grad(loss_f, argnums=(0, 1))(x, k2f)
    # dk: both paths round the same f32 product x*g to bf16 -> exact match
    np.testing.assert_array_equal(np.asarray(dk, np.float32),
                                  np.asarray(dkf.astype(jnp.bfloat16),
                                             np.float32))
    # dx: the bf16 path stores q = g*k rounded to bf16 (~0.4% per term,
    # f32 accumulate) -> bounded relative error vs the f32-q path
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxf),
                               rtol=2e-2, atol=1e-1)


def test_interpn_pallas_gradient_matches_gather():
    # the custom VJP must equal grad of the exact gather chain in-window
    from neurite_tpu.ops import pallas_warp
    D, H, W = 8, 8, 128
    vol = jnp.asarray(rng.normal(size=(D, H, W)), jnp.float32)
    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in (D, H, W)], indexing='ij'), -1)
    loc = grid + jnp.asarray(rng.uniform(-1.5, 1.5, size=(D, H, W, 3)),
                             jnp.float32)

    def loss_p(v, l):
        return jnp.sum(pallas_warp.interpn_pallas(
            v, l, max_disp=3.0, block=(4, 8), interpret=True) ** 2)

    def loss_g(v, l):
        return jnp.sum(core.interpn(v, l) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(vol, loc)
    gg = jax.grad(loss_g, argnums=(0, 1))(vol, loc)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gg[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gg[1]),
                               rtol=1e-4, atol=1e-4)


def test_interpn_window_differentiable():
    # impl='window' must be differentiable end-to-end (cond over engines)
    from neurite_tpu.ops import warp as warp_mod
    D, H, W = 8, 8, 16
    vol = jnp.asarray(rng.normal(size=(D, H, W)), jnp.float32)
    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in (D, H, W)], indexing='ij'), -1)
    loc = grid + 0.4

    def loss(v):
        return jnp.sum(warp_mod.interpn_window(v, loc, window_pad=3) ** 2)

    g = jax.grad(loss)(vol)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize('batched', [False, True])
def test_interpn_pallas_channels_match_generic(batched):
    from neurite_tpu.ops import pallas_warp
    D, H, W, C = 6, 8, 128, 3
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)), jnp.float32)
    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in (D, H, W)], indexing='ij'), -1)
    loc = grid + jnp.asarray(rng.uniform(-1.5, 1.5, size=(D, H, W, 3)),
                             jnp.float32)
    want = core.interpn(vol, loc, fill_value=0.)
    v, l = (vol[None], loc[None]) if batched else (vol, loc)
    got = pallas_warp.interpn_pallas(v, l, fill_value=0., max_disp=3.0,
                                     block=(2, 4), interpret=True)
    if batched:
        got = got[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_interpn_pallas_channels_gradient():
    from neurite_tpu.ops import pallas_warp
    D, H, W, C = 4, 8, 128, 2
    vol = jnp.asarray(rng.normal(size=(D, H, W, C)), jnp.float32)
    grid = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                    for s in (D, H, W)], indexing='ij'), -1)
    loc = grid + 0.3

    def loss_p(v, l):
        return jnp.sum(pallas_warp.interpn_pallas(
            v, l, max_disp=2.0, block=(2, 4), interpret=True) ** 2)

    def loss_g(v, l):
        return jnp.sum(core.interpn(v, l) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(vol, loc)
    gg = jax.grad(loss_g, argnums=(0, 1))(vol, loc)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gg[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gg[1]),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Pallas locally-connected kernel v2 (ops/pallas_lc2.py) — interpret mode.
# v2 takes the TRANSPOSED kernel storage [1, prod(k)*C, V] (ops/lc_tap.py)
# and single-halo-DMA blocks (the multi-DMA v1 kernel cannot compile on the
# remote Mosaic pool — benchmarks/pallas_lc_probe.py).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('shape3,C,ks', [
    ((6, 8, 8), 3, (3, 3, 3)),
    ((4, 8, 16), 1, (3, 3, 3)),
    ((8, 6, 8), 2, (3, 1, 3)),
    ((5, 5, 7), 2, (3, 3, 3)),
])
def test_lc_pallas2_matches_jnp_transposed(shape3, C, ks):
    from neurite_tpu.ops import lc_tap, pallas_lc2
    D, H, W = shape3
    V = D * H * W
    TC = int(np.prod(ks)) * C
    x = jnp.asarray(rng.normal(size=(2, D, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, TC, V)), jnp.float32)
    want = lc_tap.lc_transposed(x, k, ks, 'same')
    got = pallas_lc2.lc_transposed_pallas(x, k, ks, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_lc_pallas2_gradients_match_jnp():
    from neurite_tpu.ops import lc_tap, pallas_lc2
    D, H, W, C = 6, 8, 8, 3
    ks = (3, 3, 3)
    V, TC = D * H * W, 27 * C
    x = jnp.asarray(rng.normal(size=(1, D, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, TC, V)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, D, H, W, 1)), jnp.float32)

    def loss_ref(x, k):
        return jnp.sum(lc_tap.lc_transposed(x, k, ks, 'same') * g)

    def loss_pal(x, k):
        return jnp.sum(pallas_lc2.lc_transposed_pallas(x, k, ks, True) * g)

    dr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    dp = jax.grad(loss_pal, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dp[0]), np.asarray(dr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp[1]), np.asarray(dr[1]),
                               atol=1e-5, rtol=1e-5)


def test_lc_pallas2_multi_filter_matches_jnp():
    """filters > 1 (r4): the in-block output loop must match the jnp
    transposed form in value and both gradients."""
    from neurite_tpu.ops import lc_tap, pallas_lc2
    D, H, W, C, O = 5, 8, 8, 2, 3
    ks = (3, 3, 3)
    V, TC = D * H * W, 27 * C
    x = jnp.asarray(rng.normal(size=(2, D, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(O, TC, V)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, D, H, W, O)), jnp.float32)

    want = lc_tap.lc_transposed(x, k, ks, 'same')
    got = pallas_lc2.lc_transposed_pallas(x, k, ks, True)
    assert got.shape == (2, D, H, W, O)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss_ref(x, k):
        return jnp.sum(lc_tap.lc_transposed(x, k, ks, 'same') * g)

    def loss_pal(x, k):
        return jnp.sum(pallas_lc2.lc_transposed_pallas(x, k, ks, True) * g)

    dr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    dp = jax.grad(loss_pal, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dp[0]), np.asarray(dr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp[1]), np.asarray(dr[1]),
                               atol=1e-5, rtol=1e-5)


def test_lc_pallas2_bf16_kernel_dk_dtype():
    # bf16 params: dk must come back bf16 (written natively by the dk
    # kernel) and match the f32 reference to bf16 rounding
    from neurite_tpu.ops import lc_tap, pallas_lc2
    D, H, W, C = 4, 8, 8, 2
    ks = (3, 3, 3)
    V, TC = D * H * W, 27 * C
    x = jnp.asarray(rng.normal(size=(1, D, H, W, C)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(1, TC, V)), jnp.float32)
    kb = kf.astype(jnp.bfloat16)

    def loss_pal(k):
        return jnp.sum(pallas_lc2.lc_transposed_pallas(x, k, ks, True) ** 2)

    dkb = jax.grad(loss_pal)(kb)
    assert dkb.dtype == jnp.bfloat16

    def loss_ref(k):
        return jnp.sum(lc_tap.lc_transposed(x, k, ks, 'same') ** 2)

    dkf = jax.grad(loss_ref)(kb.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(dkb, np.float32), np.asarray(dkf),
                               rtol=3e-2, atol=3e-2)


def test_lc_pallas2_supported_gate():
    from neurite_tpu.ops import pallas_lc2
    ok = pallas_lc2.supported((1, 8, 8, 8, 3), (3, 3, 3), 1, (1, 1, 1),
                              'same')
    assert ok
    # filters > 1 rides the in-block output loop (r4) within the unroll cap
    assert pallas_lc2.supported((1, 8, 8, 8, 3), (3, 3, 3), 2,
                                (1, 1, 1), 'same')
    # rejects: unroll cap (O*TC > 512), even kernel, valid padding, wide
    # channels, strides
    assert not pallas_lc2.supported((1, 8, 8, 8, 8), (3, 3, 3), 4,
                                    (1, 1, 1), 'same')
    assert not pallas_lc2.supported((1, 8, 8, 8, 3), (2, 3, 3), 1,
                                    (1, 1, 1), 'same')
    assert not pallas_lc2.supported((1, 8, 8, 8, 3), (3, 3, 3), 1,
                                    (1, 1, 1), 'valid')
    assert not pallas_lc2.supported((1, 8, 8, 8, 32), (3, 3, 3), 1,
                                    (1, 1, 1), 'same')
    assert not pallas_lc2.supported((1, 8, 8, 8, 3), (3, 3, 3), 1,
                                    (2, 1, 1), 'same')


@pytest.mark.parametrize('padding,C,O,B', [('same', 3, 1, 1),
                                           ('same', 2, 4, 2),
                                           ('valid', 3, 2, 2)])
def test_lc_transposed_custom_vjp_matches_autodiff(padding, C, O, B):
    """The hand-written V-major backward (lc_tap.lc_transposed_dx/_dk —
    added after XLA's auto-transpose chose C-on-lanes layouts with 32x
    padding at head scale) must match raw autodiff of the jnp form."""
    from neurite_tpu.ops import lc_tap
    rng = np.random.default_rng(11)
    ks = (3, 3, 3)
    sp = (6, 5, 7)
    out_sp = sp if padding == 'same' else tuple(s - 2 for s in sp)
    V = int(np.prod(out_sp))
    x = jnp.asarray(rng.normal(size=(B, *sp, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(O, 27 * C, V)) * 0.2, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, *out_sp, O)), jnp.float32)

    def loss_custom(x, k):
        return jnp.sum(lc_tap.lc_transposed(x, k, ks, padding) * g)

    def loss_raw(x, k):
        return jnp.sum(lc_tap._lc_transposed_impl(x, k, ks, padding) * g)

    np.testing.assert_allclose(np.asarray(loss_custom(x, k)),
                               np.asarray(loss_raw(x, k)), rtol=1e-6)
    dxc, dkc = jax.grad(loss_custom, argnums=(0, 1))(x, k)
    dxr, dkr = jax.grad(loss_raw, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dxc), np.asarray(dxr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dkc), np.asarray(dkr),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas fused max-pool (ops/pool_pallas.py) — interpret mode. Replaces the
# lane-axis reduce_window pair that ran at ~16x its byte roofline in the
# UNet-128^3 step (round-5 profile, docs/DESIGN.md).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('shape,dt', [
    ((1, 16, 8, 8, 8), jnp.float32),
    ((2, 8, 16, 8, 16), jnp.float32),
    ((1, 16, 12, 20, 16), jnp.bfloat16),
])
def test_pool_pallas_matches_tiled(shape, dt, monkeypatch):
    monkeypatch.setenv('NEURITE_PALLAS_POOL', 'interpret')
    import importlib
    from neurite_tpu.ops import pool_pallas
    importlib.reload(pool_pallas)
    from neurite_tpu.ops.pool import _max_pool_tiled
    # quantized values force duplicated maxima -> tie-break paths
    x = jnp.asarray(np.round(rng.normal(size=shape) * 2) / 2, dt)
    ref = _max_pool_tiled(x, (2, 2, 2))
    got = pool_pallas.max_pool2_3d(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    g = jnp.asarray(rng.normal(size=ref.shape), dt)
    _, vr = jax.vjp(lambda v: _max_pool_tiled(v, (2, 2, 2)), x)
    _, vn = jax.vjp(pool_pallas.max_pool2_3d, x)
    np.testing.assert_array_equal(np.asarray(vn(g)[0]), np.asarray(vr(g)[0]))


def test_pool_pallas_supported_gate():
    from neurite_tpu.ops import pool_pallas
    assert pool_pallas.supported((1, 128, 128, 128, 16), (2, 2, 2),
                                 jnp.bfloat16)
    assert not pool_pallas.supported((1, 128, 128, 128, 7), (2, 2, 2),
                                     jnp.bfloat16)          # odd channels
    assert not pool_pallas.supported((1, 127, 128, 128, 16), (2, 2, 2),
                                     jnp.bfloat16)          # odd spatial
    assert not pool_pallas.supported((1, 64, 64, 16), (2, 2),
                                     jnp.float32)            # 2-D


# ---------------------------------------------------------------------------
# Single-pass weight-gradient formulations for the z-decomposed conv
# (ops/zdecomp.py dw_impl): the per-tap default re-read the full volumes kd
# times (~5.5ms of the 30ms UNet step, round-5 profile).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('impl', ['gstack', 'conv3d'])
@pytest.mark.parametrize('kd,f', [(3, 7), (2, 4)])
def test_conv_z2d_dw_impls_match_pertap(impl, kd, f):
    from neurite_tpu.ops.zdecomp import conv_z2d
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 12, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(kd, 3, 3, 5, f)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 8, 10, 12, f)), jnp.float32)
    y0, vjp0 = jax.vjp(lambda a, b: conv_z2d(a, b, dw_impl='pertap'), x, k)
    y1, vjp1 = jax.vjp(lambda a, b: conv_z2d(a, b, dw_impl=impl), x, k)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    (dx0, dk0), (dx1, dk1) = vjp0(g), vjp1(g)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk0),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize('kd,f', [(3, 7), (2, 4), (1, 3)])
def test_conv_z2d_outslice_matches_inslice(kd, f):
    """r5 'outslice' z-decomposition (conv the full padded plane stack,
    shift on the output side — no conv-operand lane-relayout copies) must
    match the r2-r4 'inslice' form exactly, values and gradients."""
    from neurite_tpu.ops.zdecomp import _conv_z2d_core
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 12, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(kd, 3, 3, 5, f)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 8, 10, 12, f)), jnp.float32)
    y0, vjp0 = jax.vjp(lambda a, b: _conv_z2d_core(a, b, 'inslice'), x, k)
    y1, vjp1 = jax.vjp(lambda a, b: _conv_z2d_core(a, b, 'outslice'), x, k)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    (dx0, dk0), (dx1, dk1) = vjp0(g), vjp1(g)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk0), atol=1e-4,
                               rtol=1e-5)


def test_lc_dx_mstack_matches_percslice(monkeypatch):
    """The 'mstack' dx formulation (one broadcast multiply + leading-axis
    slices; a measured-and-rejected layout probe, docs/DESIGN.md) must
    stay numerically identical to the default per-(c)-slice form."""
    from neurite_tpu.ops import lc_tap
    ks, C, O, B = (3, 3, 3), 2, 2, 2
    sp = (6, 7, 8)
    tc = int(np.prod(ks)) * C
    V = int(np.prod(sp))
    g = jnp.asarray(rng.normal(size=(B, *sp, O)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(O, tc, V)), jnp.float32)
    monkeypatch.setenv('NEURITE_LC_DX_FORM', 'percslice')
    a = lc_tap.lc_transposed_dx(g, k, ks, 'same', (B, *sp, C))
    monkeypatch.setenv('NEURITE_LC_DX_FORM', 'mstack')
    b = lc_tap.lc_transposed_dx(g, k, ks, 'same', (B, *sp, C))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
