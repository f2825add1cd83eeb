"""
Numerical-parity and property tests for the core op layer (SURVEY.md §4 items 1-2).

Oracles are independent numpy implementations of the documented reference
algorithms (reference `neurite/tf/utils/utils.py`), plus scipy where applicable.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neurite_tpu as ne
from neurite_tpu.utils import core

RTOL = 1e-5
ATOL = 1e-5


def np_interpn_linear(vol, loc, fill_value=None):
    """Numpy oracle for N-D linear interpolation with edge clamping."""
    vol = np.asarray(vol, np.float64)
    had_channels = True
    nb_dims = loc.shape[-1]
    if vol.ndim == nb_dims:
        vol = vol[..., None]
        had_channels = False
    max_loc = [d - 1 for d in vol.shape[:-1]]

    loc0 = np.floor(loc)
    clipped = [np.clip(loc[..., d], 0, max_loc[d]) for d in range(nb_dims)]
    loc0c = [np.clip(loc0[..., d], 0, max_loc[d]) for d in range(nb_dims)]
    loc1 = [np.clip(loc0c[d] + 1, 0, max_loc[d]) for d in range(nb_dims)]
    locs = [[f.astype(int) for f in loc0c], [f.astype(int) for f in loc1]]
    d1 = [loc1[d] - clipped[d] for d in range(nb_dims)]
    d0 = [1 - f for f in d1]
    wts = [d1, d0]

    out = 0
    for c in itertools.product([0, 1], repeat=nb_dims):
        idx = tuple(locs[c[d]][d] for d in range(nb_dims))
        w = np.ones_like(d1[0])
        for d in range(nb_dims):
            w = w * wts[c[d]][d]
        out = out + w[..., None] * vol[idx]

    if fill_value is not None:
        oob = np.zeros(loc.shape[:-1], bool)
        for d in range(nb_dims):
            oob |= (loc[..., d] < 0) | (loc[..., d] > max_loc[d])
        out = np.where(oob[..., None], fill_value, out)
    return out if had_channels else out[..., 0]


class TestInterpn:
    @pytest.mark.parametrize('ndim', [1, 2, 3])
    def test_linear_matches_oracle(self, ndim):
        rng = np.random.default_rng(0)
        shape = (7, 9, 5)[:ndim]
        vol = rng.normal(size=shape).astype(np.float32)
        loc = rng.uniform(-1, max(shape), size=(11, 13, ndim)).astype(np.float32)
        got = core.interpn(vol, loc, interp_method='linear')
        want = np_interpn_linear(vol, loc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_linear_with_channels(self):
        rng = np.random.default_rng(1)
        vol = rng.normal(size=(6, 8, 3)).astype(np.float32)
        loc = rng.uniform(0, 6, size=(10, ndim := 2)).astype(np.float32)
        got = core.interpn(vol, loc)
        want = np_interpn_linear(vol, loc)
        assert got.shape == (10, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_loc_as_list(self):
        rng = np.random.default_rng(2)
        vol = rng.normal(size=(6, 8)).astype(np.float32)
        locl = [rng.uniform(0, 5, (4, 4)).astype(np.float32) for _ in range(2)]
        got_list = core.interpn(vol, locl)
        got_stack = core.interpn(vol, np.stack(locl, -1))
        np.testing.assert_allclose(got_list, got_stack)

    def test_nearest(self):
        rng = np.random.default_rng(3)
        vol = rng.normal(size=(6, 8)).astype(np.float32)
        loc = rng.uniform(-1, 8, size=(20, 2)).astype(np.float32)
        got = core.interpn(vol, loc, interp_method='nearest')
        idx0 = np.clip(np.round(loc[:, 0]).astype(int), 0, 5)
        idx1 = np.clip(np.round(loc[:, 1]).astype(int), 0, 7)
        np.testing.assert_allclose(got, vol[idx0, idx1])

    def test_fill_value(self):
        vol = np.arange(16, dtype=np.float32).reshape(4, 4)
        loc = np.array([[-1.0, 0.0], [1.5, 1.5], [5.0, 0.0]], np.float32)
        got = core.interpn(vol, loc, fill_value=-7.0)
        assert got[0] == -7.0 and got[2] == -7.0
        np.testing.assert_allclose(got[1], np_interpn_linear(vol, loc)[1])

    def test_int_loc_casting(self):
        vol = np.arange(12, dtype=np.float32).reshape(3, 4)
        loc = np.array([[0, 0], [2, 3]], np.int32)
        got = core.interpn(vol, loc)
        np.testing.assert_allclose(got, [0.0, 11.0])

    def test_identity_at_grid_points(self):
        rng = np.random.default_rng(4)
        vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
        grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32)
                                      for s in vol.shape], indexing='ij'), -1)
        got = core.interpn(vol, grid)
        np.testing.assert_allclose(got, vol, rtol=RTOL, atol=ATOL)

    def test_jit_and_grad(self):
        vol = jnp.arange(24.0).reshape(4, 6)
        loc = jnp.array([[1.2, 2.7]])
        f = jax.jit(lambda v, l: core.interpn(v, l).sum())
        g = jax.grad(f)(vol, loc)
        assert np.isfinite(np.asarray(g)).all()


class TestResize:
    def test_zoom_one_is_identity(self):
        x = np.random.default_rng(0).normal(size=(5, 7, 2)).astype(np.float32)
        np.testing.assert_allclose(core.resize(x, [1, 1]), x)

    def test_upsample_shape(self):
        x = np.random.default_rng(0).normal(size=(4, 6, 3)).astype(np.float32)
        y = core.resize(x, [2, 2])
        assert y.shape == (8, 12, 3)

    def test_matches_scipy_zoom_interior(self):
        # linspace-endpoint resampling equals linear interp of the source grid
        x = np.linspace(0, 1, 8, dtype=np.float32)[:, None] * np.ones((8, 8), np.float32)
        y = np.asarray(core.resize(x[..., None], [2, 2]))[..., 0]
        # linear ramp stays a linear ramp after linear resize
        np.testing.assert_allclose(y[:, 0], np.linspace(0, 1, 16), rtol=1e-5, atol=1e-6)

    def test_downsample_nearest(self):
        x = np.arange(16, dtype=np.float32).reshape(4, 4)
        y = core.resize(x[..., None], [0.5, 0.5], interp_method='nearest')
        assert y.shape == (2, 2, 1)


class TestGrids:
    def test_ndgrid_matches_numpy(self):
        got = core.ndgrid(jnp.arange(3), jnp.arange(4))
        want = np.meshgrid(np.arange(3), np.arange(4), indexing='ij')
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_meshgrid_xy(self):
        got = core.meshgrid(jnp.arange(3), jnp.arange(4))
        want = np.meshgrid(np.arange(3), np.arange(4), indexing='xy')
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_volshape_to_ndgrid(self):
        grids = core.volshape_to_ndgrid([2, 3, 4])
        assert len(grids) == 3 and grids[0].shape == (2, 3, 4)

    def test_meshgrid_bad_indexing(self):
        with pytest.raises(ValueError):
            core.meshgrid(jnp.arange(2), indexing='zz')


class TestFilters:
    def test_gaussian_kernel_sums_to_one(self):
        # window = round(3*sigma)*2 + 1 with numpy half-to-even rounding
        k = core.gaussian_kernel([1.5, 2.0])
        assert k.shape == (9, 13)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-6)

    def test_gaussian_kernel_separate(self):
        ks = core.gaussian_kernel([1.0, 2.0], separate=True)
        assert isinstance(ks, list) and len(ks) == 2
        assert ks[0].shape == (7,) and ks[1].shape == (13,)  # round(3σ)*2+1
        for k in ks:
            np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-6)

    def test_gaussian_kernel_matches_formula(self):
        sigma = 1.5
        k = np.asarray(core.gaussian_kernel(sigma))
        w = int(np.round(sigma * 3) * 2 + 1)
        xs = np.arange(w) - (w - 1) / 2
        want = np.exp(-0.5 * xs**2 / sigma**2)
        want = want / want.sum()
        np.testing.assert_allclose(k, want, rtol=1e-5, atol=1e-7)

    def test_gaussian_random_within_bounds(self):
        ks = core.gaussian_kernel([3.0], separate=True, random=True,
                                  min_sigma=1.0, seed=0)
        k = np.asarray(ks)
        assert k.shape == (19,)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    def test_separable_conv_matches_dense_conv(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 16, 2)).astype(np.float32)
        k = np.asarray(core.gaussian_kernel(1.0, separate=False))  # 1D kernel
        got = np.asarray(core.separable_conv(x, [jnp.asarray(k)], axis=[0]))
        # scipy oracle: correlate along axis 0, same padding, per channel
        from scipy.ndimage import correlate1d
        want = np.stack([correlate1d(x[..., c], k, axis=0, mode='constant')
                         for c in range(2)], -1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_separable_conv_2d_gaussian_equals_full(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(20, 20, 1)).astype(np.float32)
        ks = core.gaussian_kernel([1.0, 1.0], separate=True)
        got = np.asarray(core.separable_conv(x, ks))
        k2d = np.asarray(core.gaussian_kernel([1.0, 1.0], separate=False))
        from scipy.ndimage import correlate
        want = correlate(x[..., 0], k2d, mode='constant')[..., None]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_separable_conv_batched(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 10, 12, 2)).astype(np.float32)
        ks = core.gaussian_kernel([1.0, 1.0], separate=True)
        got = core.separable_conv(x, ks, batched=True)
        per_item = jnp.stack([core.separable_conv(x[i], ks) for i in range(3)])
        np.testing.assert_allclose(got, per_item, rtol=1e-5, atol=1e-6)

    def test_separable_conv_strides(self):
        x = np.random.default_rng(3).normal(size=(16, 16, 1)).astype(np.float32)
        ks = core.gaussian_kernel([1.0], separate=True)
        y = core.separable_conv(x, [ks], axis=[0], strides=[2])
        assert y.shape == (8, 16, 1)


class TestSubsample:
    def test_shape_preserved_with_upsample(self):
        x = jnp.arange(24.0).reshape(4, 6)
        y = core.subsample_axis(x, stride_min=2, stride_max=4, seed=0)
        assert y.shape == x.shape

    def test_jittable(self):
        x = jnp.arange(64.0).reshape(8, 8)
        f = jax.jit(lambda x, k: core.subsample_axis(x, 2, 4, seed=k))
        y = f(x, jax.random.PRNGKey(0))
        assert y.shape == x.shape

    def test_stride_one_is_identity(self):
        x = jnp.arange(24.0).reshape(4, 6)
        y = core.subsample_axis(x, stride_min=1, stride_max=1.0000001, seed=0)
        np.testing.assert_allclose(y, x)

    def test_matches_reference_algorithm(self):
        # stride exactly 2 on axis 0 of length 8: num_slice=4, indices 0,2,5,7
        x = np.arange(8, dtype=np.float32)[:, None] * np.ones((8, 4), np.float32)
        # force axis=0 via axes=[0]; thick fixed by stride_min≈stride_max
        y = np.asarray(core.subsample_axis(jnp.asarray(x), 2.0, 2.0000001,
                                           axes=[0], seed=1))
        num_slice = int(8 / 2.0 + 0.5)
        dn = np.floor(np.linspace(0, 7, num_slice) + 0.5).astype(int)
        up = np.floor(np.linspace(0, num_slice - 1, 8) + 0.5).astype(int)
        want = x[dn][up]
        np.testing.assert_allclose(y, want)


class TestActivations:
    def test_softmax_alpha(self):
        x = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
        got = core.softmax(x, alpha=2.0)
        e = np.exp(2 * x - np.max(2 * x, -1, keepdims=True))
        want = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_logistic_fixed_ends(self):
        np.testing.assert_allclose(core.logistic_fixed_ends(jnp.asarray(-1.0)), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(core.logistic_fixed_ends(jnp.asarray(1.0)), 1.0,
                                   atol=1e-6)

    def test_soft_round_near_integers(self):
        x = jnp.asarray([0.0, 1.0, 2.0, -3.0])
        np.testing.assert_allclose(core.soft_round(x), x, atol=1e-5)

    def test_soft_delta_peak(self):
        v = core.soft_delta(jnp.asarray(0.0))
        assert float(v) == pytest.approx(1.0, abs=1e-6)

    def test_odd_shifted_relu_odd_symmetry(self):
        x = jnp.linspace(-3, 3, 13)
        y = core.odd_shifted_relu(x)
        np.testing.assert_allclose(y, -core.odd_shifted_relu(-x)[...], atol=1e-6)

    def test_minmax_norm(self):
        x = jnp.asarray([2.0, 4.0, 6.0])
        np.testing.assert_allclose(core.minmax_norm(x), [0, 0.5, 1.0])
        # safe division: constant input -> zeros
        np.testing.assert_allclose(core.minmax_norm(jnp.ones(4)), np.zeros(4))

    def test_whiten(self):
        x = jnp.asarray(np.random.default_rng(0).normal(2, 3, size=1000),
                        dtype=jnp.float32)
        y = core.whiten(x, mean=1.0, std=0.5)
        assert float(jnp.mean(y)) == pytest.approx(1.0, abs=1e-3)
        assert float(jnp.std(y)) == pytest.approx(0.5, abs=1e-3)


class TestSoftQuantize:
    def test_rows_are_rbf(self):
        x = jnp.asarray([0.0, 0.5, 1.0])
        q = np.asarray(core.soft_quantize(x, bin_centers=[0.0, 1.0],
                                          nb_bins=None, alpha=2.0))
        want = np.exp(-2.0 * (np.asarray(x)[:, None] -
                              np.array([0.0, 1.0])[None]) ** 2)
        np.testing.assert_allclose(q, want, rtol=1e-5)

    def test_dynamic_bin_centers(self):
        x = jnp.linspace(0, 10, 50)
        q = core.soft_quantize(x, nb_bins=8)
        assert q.shape == (50, 8)
        # each value's max-weight bin center should be its nearest linspace bin
        centers = np.linspace(0, 10, 8)
        nearest = np.argmin(np.abs(np.asarray(x)[:, None] - centers[None]), -1)
        np.testing.assert_array_equal(np.argmax(np.asarray(q), -1), nearest)

    def test_return_log(self):
        x = jnp.asarray([1.0, 2.0])
        lg = core.soft_quantize(x, bin_centers=[1.0, 3.0], nb_bins=None,
                                return_log=True)
        np.testing.assert_allclose(np.exp(np.asarray(lg)),
                                   core.soft_quantize(x, bin_centers=[1.0, 3.0],
                                                      nb_bins=None), rtol=1e-6)


class TestShapes:
    def test_flatten(self):
        x = jnp.arange(24).reshape(2, 3, 4)
        assert core.flatten(x).shape == (24,)

    def test_flatten_axes(self):
        x = jnp.zeros((3, 4, 5, 6))
        assert core.flatten_axes(x, [1, 2]).shape == (3, 20, 6)

    def test_batch_channel_flatten(self):
        x = jnp.zeros((2, 3, 4, 5))
        assert core.batch_channel_flatten(x).shape == (2, 12, 5)

    def test_flatten_axes_non_contiguous_raises(self):
        with pytest.raises(AssertionError):
            core.flatten_axes(jnp.zeros((2, 3, 4)), [0, 2])

    def test_take(self):
        x = jnp.arange(12).reshape(3, 4)
        np.testing.assert_array_equal(core.take(x, 1, axis=0), x[1])
        np.testing.assert_array_equal(core.take(x, [1], axis=0), x[1:2])

    def test_batch_gather(self):
        ref = jnp.asarray([[3, 5, 7], [11, 13, 17]])
        np.testing.assert_array_equal(core.batch_gather(ref, jnp.asarray([2, 1])),
                                      [7, 13])

    def test_sub2ind2d(self):
        siz = (3, 4, 5)
        subs = [np.array([1, 2]), np.array([0, 3]), np.array([4, 1])]
        idx = core.sub2ind2d(siz, subs)
        want = np.ravel_multi_index(subs, siz)
        np.testing.assert_array_equal(idx, want)


class TestFFT:
    def test_fftn_matches_numpy(self):
        x = np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32)
        got = np.asarray(core.fftn(x))
        want = np.fft.fftn(x).astype(np.complex64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_fftn_axes_subset(self):
        x = np.random.default_rng(1).normal(size=(4, 6, 8)).astype(np.float32)
        got = np.asarray(core.fftn(x, axes=[1]))
        want = np.fft.fft(x, axis=1).astype(np.complex64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_ifft_roundtrip(self):
        x = np.random.default_rng(2).normal(size=(8, 8)).astype(np.float32)
        rt = np.asarray(core.ifftn(core.fftn(x)))
        np.testing.assert_allclose(rt.real, x, rtol=1e-4, atol=1e-5)

    def test_complex_channels_roundtrip(self):
        x = np.random.default_rng(3).normal(size=(4, 6)).astype(np.float32)
        c = core.channels_to_complex(jnp.asarray(x))
        assert c.shape == (4, 3)
        back = core.complex_to_channels(c)
        np.testing.assert_allclose(back, x, rtol=1e-6)


class TestBarycenter:
    def test_uniform_volume_center(self):
        x = np.ones((5, 7), np.float32)
        got = np.asarray(core.barycenter(x))
        np.testing.assert_allclose(got, [2.0, 3.0], rtol=1e-6)

    def test_point_mass(self):
        x = np.zeros((5, 5), np.float32)
        x[1, 3] = 1.0
        np.testing.assert_allclose(np.asarray(core.barycenter(x)), [1.0, 3.0],
                                   atol=1e-6)

    def test_batch_axes(self):
        x = np.zeros((2, 5, 5), np.float32)
        x[0, 1, 1] = 1
        x[1, 3, 2] = 1
        got = np.asarray(core.barycenter(x, axes=(1, 2)))
        np.testing.assert_allclose(got, [[1, 1], [3, 2]], atol=1e-6)

    def test_shift_center_normalize(self):
        x = np.ones((4, 4), np.float32)
        got = np.asarray(core.barycenter(x, shift_center=True))
        np.testing.assert_allclose(got, [0.0, 0.0], atol=1e-6)
        got = np.asarray(core.barycenter(x, normalize=True))
        np.testing.assert_allclose(got, [1.5 / 4, 1.5 / 4], atol=1e-6)


class TestMapFnAxis:
    def test_single_tensor(self):
        x = jnp.arange(24.0).reshape(2, 3, 4)
        got = core.map_fn_axis(lambda s: s * 2, x, axis=1)
        np.testing.assert_allclose(got, x * 2)

    def test_reduces_correctly(self):
        x = jnp.arange(24.0).reshape(2, 3, 4)
        got = core.map_fn_axis(lambda s: jnp.sum(s), x, axis=2)
        np.testing.assert_allclose(got, jnp.sum(x, axis=(0, 1)))


class TestPerlin:
    def test_perlin_vol_shape(self):
        v = core.perlin_vol((16, 16), seed=0)
        assert v.shape == (16, 16)
        assert np.isfinite(np.asarray(v)).all()

    def test_perlin_vol_random_weights(self):
        v = core.perlin_vol((8, 8), wt_type='random', seed=1)
        assert v.shape == (8, 8)


class TestNormalizeAxes:
    def test_negative(self):
        assert ne.py.utils.normalize_axes([-1], (2, 3, 4)) == (2,)

    def test_none_all(self):
        assert ne.py.utils.normalize_axes(None, (2, 3), none_means_all=True) == (0, 1)

    def test_none_empty(self):
        assert ne.py.utils.normalize_axes(None, (2, 3)) == ()

    def test_out_of_range(self):
        with pytest.raises(IndexError):
            ne.py.utils.normalize_axes([5], (2, 3))

    def test_dedup_sort(self):
        assert ne.py.utils.normalize_axes([2, 0, 2], (2, 3, 4)) == (0, 2)


class TestRebaseLab:
    def test_roundtrip(self):
        labs = np.array([0, 4, 7, 4, 0])
        to_ind, to_lab = ne.py.utils.rebase_lab(labs)
        rebased = to_ind[labs]
        np.testing.assert_array_equal(rebased, [0, 1, 2, 1, 0])
        np.testing.assert_array_equal(to_lab[rebased], labs)


class TestSpaceToDepth:
    def test_roundtrip(self):
        rng_l = np.random.default_rng(0)
        for batched in (True, False):
            for shape in [(8, 6), (4, 8, 6)]:
                full = ((2,) if batched else ()) + shape + (3,)
                x = jnp.asarray(rng_l.normal(size=full), jnp.float32)
                f = ne.utils.space_to_depth(x, 2, batched=batched)
                assert f.shape[-1] == 3 * 2 ** len(shape)
                back = ne.utils.depth_to_space(f, 2, batched=batched)
                np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_block_content(self):
        """Channel groups hold the block elements in index order."""
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        f = ne.utils.space_to_depth(x, 2)
        # first output voxel covers input rows 0-1, cols 0-1
        np.testing.assert_allclose(np.asarray(f[0, 0, 0]), [0., 1., 4., 5.])

    def test_indivisible_raises(self):
        with pytest.raises(AssertionError):
            ne.utils.space_to_depth(jnp.zeros((1, 5, 4, 1)), 2)
