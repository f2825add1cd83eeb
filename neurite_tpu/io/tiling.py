"""
Patch extraction and quilt reassembly for N-D volumes (pystrum-free).

The reference delegates to `pystrum.pynd.patchlib` (`patch_gen` in
`neurite/tf/generators.py:297`, `quilt` in `neurite/tf/utils/seg.py:363-374`);
pystrum is unavailable here, so the tiling is implemented natively. This is
the host-level spatial decomposition used for whole-volume patch inference
(SURVEY.md §5.7) — the orthogonal complement to on-device mesh sharding.
"""

import itertools

import numpy as np


def _conform(v, ndims, name):
    if np.isscalar(v):
        return (int(v),) * ndims
    v = tuple(int(x) for x in v)
    assert len(v) == ndims, f'{name} length {len(v)} != ndims {ndims}'
    return v


def patch_starts(vol_shape, patch_size, stride=None):
    """Per-axis start indices of a covering patch grid (last patch clamped
    so the full volume is covered)."""
    ndims = len(vol_shape)
    patch_size = _conform(patch_size, ndims, 'patch_size')
    stride = patch_size if stride is None else _conform(stride, ndims, 'stride')

    axis_starts = []
    for d in range(ndims):
        assert patch_size[d] <= vol_shape[d], \
            f'patch {patch_size[d]} larger than volume {vol_shape[d]} on axis {d}'
        s = list(range(0, vol_shape[d] - patch_size[d] + 1, stride[d]))
        if s[-1] != vol_shape[d] - patch_size[d]:
            s.append(vol_shape[d] - patch_size[d])
        axis_starts.append(s)
    return axis_starts, patch_size


def grid_size(vol_shape, patch_size, stride=None):
    """Number of patches along each axis."""
    axis_starts, _ = patch_starts(vol_shape, patch_size, stride)
    return tuple(len(s) for s in axis_starts)


def patch_gen(vol, patch_size, stride=None):
    """
    Yield patches covering `vol` in row-major grid order (equivalent of
    pystrum `pl.patch_gen`, used at `generators.py:297`).
    """
    vol = np.asarray(vol)
    ndims = len(patch_size) if not np.isscalar(patch_size) else vol.ndim
    axis_starts, psize = patch_starts(vol.shape[:ndims], patch_size, stride)
    trailing = vol.shape[ndims:]
    del trailing
    for starts in itertools.product(*axis_starts):
        sl = tuple(slice(s, s + p) for s, p in zip(starts, psize))
        yield vol[sl]


def quilt(patches, patch_size, vol_shape, stride=None, agg='nanmean'):
    """
    Reassemble patches (in `patch_gen` order) into a volume, aggregating
    overlaps with nan-mean or nan-median (equivalent of pystrum `pl.quilt`
    with nan_func_layers=np.nanmedian, ref `seg.py:100-101,363-374`).
    """
    ndims = len(vol_shape)
    axis_starts, psize = patch_starts(vol_shape, patch_size, stride)
    n_patches = int(np.prod([len(s) for s in axis_starts]))
    patches = np.asarray(list(patches)) if not isinstance(patches, np.ndarray) \
        else patches
    patches = patches.reshape(n_patches, *psize)
    assert agg in ('nanmean', 'nanmedian', 'mean'), f'bad agg {agg}'

    if agg in ('nanmean', 'mean'):
        acc = np.zeros(vol_shape, np.float64)
        cnt = np.zeros(vol_shape, np.float64)
        for idx, starts in enumerate(itertools.product(*axis_starts)):
            sl = tuple(slice(s, s + p) for s, p in zip(starts, psize))
            p = patches[idx]
            mask = ~np.isnan(p)
            acc[sl] += np.where(mask, p, 0)
            cnt[sl] += mask
        with np.errstate(invalid='ignore'):
            out = acc / cnt
        return out

    # nanmedian: layered accumulation (memory ~ max overlap layers)
    max_layers = 1
    for d in range(ndims):
        st = (axis_starts[d][1] - axis_starts[d][0]) \
            if len(axis_starts[d]) > 1 else psize[d]
        max_layers *= int(np.ceil(psize[d] / max(st, 1)))
    # accumulate in the patches' floating dtype: the native f32 kernel only
    # takes f32 inputs; f64 patches keep full precision via the numpy path
    acc_dtype = np.result_type(np.asarray(patches[0]).dtype, np.float32)
    layers = np.full((max_layers, *vol_shape), np.nan, acc_dtype)
    layer_idx = np.zeros(vol_shape, np.int32)
    for idx, starts in enumerate(itertools.product(*axis_starts)):
        sl = tuple(slice(s, s + p) for s, p in zip(starts, psize))
        li = layer_idx[sl]
        flat_region = tuple(np.indices(psize).reshape(ndims, -1))
        coords = tuple(fr + s for fr, s in zip(flat_region, starts))
        layers[(li.reshape(-1), *coords)] = patches[idx].reshape(-1)
        layer_idx[sl] += 1
    # multithreaded native nth_element (io/native.py) for f32; f64 stacks
    # stay on the exact numpy path
    if layers.dtype == np.float32:
        from neurite_tpu.io import native
        return native.nan_aggregate_axis0(layers, agg='nanmedian')
    with np.errstate(invalid='ignore'):
        return np.nanmedian(layers, axis=0)


def quilt_device(patches, patch_size, vol_shape, stride=None, agg='mean'):
    """
    On-device quilt: reassemble patches into a volume WITHOUT a host round
    trip (SURVEY §5.8 "quilt on device when feasible") — jit/grad-friendly,
    so whole-volume patch inference can stay on the accelerator end to end.

    patches: [P, *patch_size, ...] device array in the row-major grid order
        `patch_gen`/`patch_starts` produce.
    agg: 'mean' (overlap average via sum + hit-count), 'nanmean' (same but
        NaN-marked voxels — the pipeline's invalid-border convention — are
        excluded from both sum and count), or 'sum'. The host `quilt` keeps
        the reference's nan-MEDIAN semantics (`seg.py:363-374`); median
        needs all overlapping layers resident, which defeats the streaming
        form — use the host path for it.

    Implementation: a `lax.scan` of dynamic_update_slice accumulate — a
    contiguous block write per patch, not a scattered gather/scatter (the
    slow class on TPU).
    """
    import jax
    import jax.numpy as jnp

    assert agg in ('mean', 'nanmean', 'sum'), agg
    patches = jnp.asarray(patches)
    ndims = len(vol_shape)
    axis_starts, psize = patch_starts(vol_shape, patch_size, stride)
    starts = np.asarray(
        [s for s in itertools.product(*axis_starts)], np.int32)
    assert patches.shape[0] == len(starts), \
        f'{patches.shape[0]} patches != {len(starts)} grid positions'
    trailing = patches.shape[1 + ndims:]

    nan_skip = agg == 'nanmean'
    acc = jnp.zeros((*vol_shape, *trailing), patches.dtype)
    cnt = jnp.zeros((*vol_shape, *trailing) if nan_skip else vol_shape,
                    jnp.float32)
    ones = jnp.ones(tuple(psize), jnp.float32)
    zeros_t = (jnp.int32(0),) * len(trailing)

    def body(carry, inp):
        acc, cnt = carry
        patch, st = inp
        idx = tuple(st[d] for d in range(ndims))
        if nan_skip:
            valid = jnp.logical_not(jnp.isnan(patch))
            patch = jnp.where(valid, patch, jnp.zeros_like(patch))
            hits = valid.astype(jnp.float32)
            cidx = idx + zeros_t
        else:
            hits = ones
            cidx = idx
        cur = jax.lax.dynamic_slice(acc, idx + zeros_t, patch.shape)
        acc = jax.lax.dynamic_update_slice(acc, cur + patch, idx + zeros_t)
        curc = jax.lax.dynamic_slice(cnt, cidx, hits.shape)
        cnt = jax.lax.dynamic_update_slice(cnt, curc + hits, cidx)
        return (acc, cnt), 0

    (acc, cnt), _ = jax.lax.scan(body, (acc, cnt), (patches, starts))
    if agg in ('mean', 'nanmean'):
        if not nan_skip:
            cnt = cnt.reshape(cnt.shape + (1,) * len(trailing))
        acc = acc / cnt.astype(acc.dtype)   # all-NaN coverage -> NaN (0/0)
    return acc
