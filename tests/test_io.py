"""IO tests: NIfTI/MGH roundtrips (+ nibabel-format cross-check via TF-less
oracle: our writer must be readable by our reader bit-exactly) and
patch/quilt identities (SURVEY.md §4 item 2)."""
import numpy as np
import pytest

from neurite_tpu import io as neio


class TestMedIO:
    @pytest.mark.parametrize('ext', ['.nii', '.nii.gz'])
    def test_nii_roundtrip(self, tmp_path, ext):
        rng = np.random.default_rng(0)
        vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
        aff = np.eye(4); aff[:3, 3] = [1, 2, 3]
        p = str(tmp_path / f'vol{ext}')
        neio.save_nii(p, vol, aff)
        out = neio.load_nii(p)
        np.testing.assert_allclose(out.data, vol, rtol=1e-6)
        np.testing.assert_allclose(out.affine, aff, rtol=1e-5)

    def test_nii_int_dtype(self, tmp_path):
        vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        p = str(tmp_path / 'v.nii')
        neio.save_nii(p, vol)
        out = neio.load_nii(p)
        np.testing.assert_array_equal(out.data, vol)

    @pytest.mark.parametrize('ext', ['.mgh', '.mgz'])
    def test_mgh_roundtrip(self, tmp_path, ext):
        rng = np.random.default_rng(1)
        vol = rng.normal(size=(4, 5, 6)).astype(np.float32)
        p = str(tmp_path / f'vol{ext}')
        neio.save_mgh(p, vol)
        out = neio.load_mgh(p)
        np.testing.assert_allclose(out.data, vol, rtol=1e-6)

    def test_volfile_npz(self, tmp_path):
        vol = np.ones((3, 3), np.float32)
        p = str(tmp_path / 'v.npz')
        neio.save_volfile(p, vol)
        np.testing.assert_array_equal(neio.load_volfile(p), vol)

    def test_volfile_dispatch(self, tmp_path):
        vol = np.ones((3, 3, 3), np.float32)
        for ext in ('.npy', '.nii.gz', '.mgz'):
            p = str(tmp_path / f'v{ext}')
            neio.save_volfile(p, vol)
            got = np.asarray(neio.load_volfile(p), np.float32)
            np.testing.assert_allclose(got, vol)

    def test_nibabel_compat_nii(self, tmp_path):
        """Cross-check against nibabel if importable (skip otherwise)."""
        nib = pytest.importorskip('nibabel')
        vol = np.random.default_rng(0).normal(size=(4, 4, 4)).astype(np.float32)
        p = str(tmp_path / 'v.nii')
        neio.save_nii(p, vol)
        out = nib.load(p)
        np.testing.assert_allclose(np.asarray(out.dataobj), vol, rtol=1e-6)


class TestTiling:
    def test_patch_count_and_shapes(self):
        vol = np.arange(100, dtype=float).reshape(10, 10)
        patches = list(neio.patch_gen(vol, (4, 4), stride=(3, 3)))
        gs = neio.grid_size((10, 10), (4, 4), (3, 3))
        assert len(patches) == int(np.prod(gs))
        assert all(p.shape == (4, 4) for p in patches)

    def test_quilt_patch_identity_no_overlap(self):
        vol = np.random.default_rng(0).normal(size=(8, 8))
        patches = list(neio.patch_gen(vol, (4, 4)))
        out = neio.quilt(patches, (4, 4), (8, 8))
        np.testing.assert_allclose(out, vol, rtol=1e-6)

    def test_quilt_overlap_mean(self):
        vol = np.random.default_rng(1).normal(size=(9, 9))
        patches = list(neio.patch_gen(vol, (4, 4), stride=(2, 2)))
        out = neio.quilt(patches, (4, 4), (9, 9), stride=(2, 2))
        np.testing.assert_allclose(out, vol, rtol=1e-5)

    def test_quilt_nanmedian(self):
        vol = np.random.default_rng(2).normal(size=(8, 8))
        patches = list(neio.patch_gen(vol, (4, 4), stride=(2, 2)))
        out = neio.quilt(patches, (4, 4), (8, 8), stride=(2, 2),
                         agg='nanmedian')
        np.testing.assert_allclose(out, vol, rtol=1e-5)

    def test_quilt_3d(self):
        vol = np.random.default_rng(3).normal(size=(6, 7, 8))
        patches = list(neio.patch_gen(vol, (4, 4, 4), stride=(2, 3, 4)))
        out = neio.quilt(patches, (4, 4, 4), (6, 7, 8), stride=(2, 3, 4))
        np.testing.assert_allclose(out, vol, rtol=1e-5)


# ------------------------------------------------------------- native hostops
class TestNativeHostOps:
    """The C++ host kernels (io/_native/hostops.cpp) must agree with the
    numpy fallbacks exactly; these tests run both paths."""

    def _numpy_mode(self):
        import contextlib
        from neurite_tpu.io import native as nv

        @contextlib.contextmanager
        def ctx():
            lib, tried = nv._lib, nv._tried
            nv._lib, nv._tried = None, True
            try:
                yield
            finally:
                nv._lib, nv._tried = lib, tried
        return ctx()

    def test_one_hot_matches_numpy(self):
        from neurite_tpu.io import native
        rng = np.random.default_rng(0)
        lab = rng.integers(-1, 6, size=(7, 9)).astype(np.int32)  # incl. OOR
        for dtype in (np.float32, bool):
            got = native.one_hot(lab, 5, dtype=dtype)
            with self._numpy_mode():
                want = native.one_hot(lab, 5, dtype=dtype)
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)

    def test_nan_aggregate_matches_numpy(self):
        from neurite_tpu.io import native
        rng = np.random.default_rng(1)
        layers = rng.normal(size=(5, 6, 7)).astype(np.float32)
        layers[rng.random(layers.shape) < 0.4] = np.nan
        layers[:, 0, 0] = np.nan                     # all-NaN column
        for agg in ('nanmedian', 'nanmean'):
            got = native.nan_aggregate_axis0(layers, agg=agg)
            with self._numpy_mode():
                want = native.nan_aggregate_axis0(layers, agg=agg)
            np.testing.assert_allclose(got, want, atol=1e-6, equal_nan=True)

    def test_relabel_matches_python(self):
        from neurite_tpu.io import native
        rng = np.random.default_rng(2)
        vol = rng.integers(0, 50, size=(6, 6, 6)).astype(np.int32)
        labels = [5, 11, 23]
        got = native.relabel(vol, labels)
        want = np.zeros(vol.shape, vol.dtype)
        for i, v in enumerate(labels):
            want[vol == v] = i
        np.testing.assert_array_equal(got, want)

    def test_quilt_nanmedian_uses_native(self):
        from neurite_tpu.io import tiling
        rng = np.random.default_rng(3)
        vol = rng.normal(size=(10, 12)).astype(np.float32)
        patches = list(tiling.patch_gen(vol, (6, 6), stride=(4, 6)))
        out = tiling.quilt(patches, (6, 6), (10, 12), stride=(4, 6),
                           agg='nanmedian')
        np.testing.assert_allclose(out, vol, atol=1e-6)


class TestQuiltDevice:
    def test_mean_matches_host_mean(self):
        import jax.numpy as jnp
        from neurite_tpu.io import tiling
        rng = np.random.default_rng(0)
        vol = rng.normal(size=(10, 12, 8)).astype(np.float32)
        patches = np.stack(list(tiling.patch_gen(vol, (6, 6, 4),
                                                 stride=(4, 6, 4))))
        got = tiling.quilt_device(jnp.asarray(patches), (6, 6, 4),
                                  (10, 12, 8), stride=(4, 6, 4), agg='mean')
        # overlap-mean of identical patch data reproduces the volume
        np.testing.assert_allclose(np.asarray(got), vol, atol=1e-6)

    def test_trailing_channels_and_jit(self):
        import jax
        import jax.numpy as jnp
        from neurite_tpu.io import tiling
        rng = np.random.default_rng(1)
        vol = rng.normal(size=(9, 9, 2)).astype(np.float32)   # 2-D + C
        patches = np.stack(list(tiling.patch_gen(vol, (5, 5),
                                                 stride=(4, 4))))
        f = jax.jit(lambda p: tiling.quilt_device(p, (5, 5), (9, 9),
                                                  stride=(4, 4)))
        got = f(jnp.asarray(patches))
        np.testing.assert_allclose(np.asarray(got), vol, atol=1e-6)

    def test_sum_counts_overlaps(self):
        import jax.numpy as jnp
        from neurite_tpu.io import tiling
        vol = np.ones((6, 6), np.float32)
        patches = np.stack(list(tiling.patch_gen(vol, (4, 4), stride=(2, 2))))
        got = tiling.quilt_device(jnp.asarray(patches), (4, 4), (6, 6),
                                  stride=(2, 2), agg='sum')
        # center cells are covered by all four patches
        assert float(np.asarray(got)[2, 2]) == 4.0

    def test_nanmean_skips_nan_voxels(self):
        import jax.numpy as jnp
        from neurite_tpu.io import tiling
        vol = np.ones((6, 6), np.float32) * 2
        patches = np.stack(list(tiling.patch_gen(vol, (4, 4), stride=(2, 2))))
        patches[0, 2, 2] = np.nan   # invalid voxel at global (2,2), covered
        patches[0, 0, 0] = np.nan   # all-NaN coverage at global (0,0)
        got = tiling.quilt_device(jnp.asarray(patches), (4, 4), (6, 6),
                                  stride=(2, 2), agg='nanmean')
        assert float(np.asarray(got)[2, 2]) == 2.0   # NaN excluded
        assert np.isnan(np.asarray(got)[0, 0])       # no valid cover -> NaN
        # plain 'mean' would poison the overlapped voxel
        got2 = tiling.quilt_device(jnp.asarray(patches), (4, 4), (6, 6),
                                   stride=(2, 2), agg='mean')
        assert np.isnan(np.asarray(got2)[2, 2])

    def test_host_quilt_preserves_float64(self):
        from neurite_tpu.io import tiling
        rng = np.random.default_rng(5)
        vol = rng.normal(size=(8, 8)).astype(np.float64)
        patches = list(tiling.patch_gen(vol, (4, 4), stride=(4, 4)))
        out = tiling.quilt(patches, (4, 4), (8, 8), stride=(4, 4))
        assert out.dtype == np.float64
        np.testing.assert_allclose(out, vol)
