"""
Axis-separable N-D resize as per-axis linear operators.

The reference implements resize as an N-D `interpn` over a full coordinate
grid (`neurite/tf/utils/utils.py:223-264` -> `:73-220`): 2^N full-volume
gathers with per-voxel index math — a scattered-access pattern that maps
poorly to TPU memory. But a zoom grid is *axis-separable*: the trilinear
weight of corner (c1..cN) is a product of per-axis weights, so the whole
resize factorizes into N independent 1-D interpolations. Each 1-D
interpolation along an axis is a [new, old] banded matrix applied along that
axis — either an MXU matmul (`impl='matmul'`) or two contiguous axis-takes
plus an fma (`impl='take'`, exact fp32, bandwidth-bound). Both produce
outputs identical to `utils.interpn` on the same grid (same clipping and
corner-weight convention), validated by parity tests.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(new_len, old_len, method):
    """[new, old] interpolation matrix matching utils.interpn conventions."""
    p = np.linspace(0., old_len - 1., new_len)
    mat = np.zeros((new_len, old_len), np.float32)
    rows = np.arange(new_len)
    if method == 'nearest':
        idx = np.clip(np.round(p), 0, old_len - 1).astype(np.int64)
        mat[rows, idx] = 1.
    else:
        # interpn linear: lo = clip(floor(p)), hi = clip(lo+1);
        # weight(lo) = hi - clip(p), weight(hi) = 1 - weight(lo).
        pc = np.clip(p, 0, old_len - 1)
        lo = np.clip(np.floor(pc), 0, old_len - 1).astype(np.int64)
        hi = np.clip(lo + 1, 0, old_len - 1)
        w_lo = hi - pc
        np.add.at(mat, (rows, lo), w_lo)
        np.add.at(mat, (rows, hi), 1. - w_lo)
    return mat


@functools.lru_cache(maxsize=256)
def _interp_take_np(new_len, old_len, method):
    """(lo_idx, hi_idx, w_lo) arrays for the two-take formulation."""
    p = np.linspace(0., old_len - 1., new_len)
    pc = np.clip(p, 0, old_len - 1)
    lo = np.clip(np.floor(pc), 0, old_len - 1).astype(np.int32)
    hi = np.clip(lo + 1, 0, old_len - 1).astype(np.int32)
    if method == 'nearest':
        idx = np.clip(np.round(p), 0, old_len - 1).astype(np.int32)
        return idx, idx, np.ones(new_len, np.float32)
    return lo, hi, (hi - pc).astype(np.float32)


def interp_matrix(new_len, old_len, method='linear', dtype=jnp.float32):
    """Public: [new, old] 1-D interpolation matrix (linear or nearest)."""
    return jnp.asarray(_interp_matrix_np(int(new_len), int(old_len), method),
                       dtype)


def _apply_axis_matmul(vol, new_len, axis, method, precision):
    old_len = vol.shape[axis]
    mat = interp_matrix(new_len, old_len, method,
                        vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating)
                        else jnp.float32)
    out = jnp.tensordot(mat, vol, axes=[[1], [axis]],
                        precision=precision,
                        preferred_element_type=mat.dtype)
    return jnp.moveaxis(out, 0, axis)


def _apply_axis_take(vol, new_len, axis, method):
    old_len = vol.shape[axis]
    lo, hi, w_lo = _interp_take_np(int(new_len), int(old_len), method)
    lo_v = jnp.take(vol, jnp.asarray(lo), axis=axis)
    if method == 'nearest':
        return lo_v
    hi_v = jnp.take(vol, jnp.asarray(hi), axis=axis)
    dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32
    w = jnp.asarray(w_lo, dtype)
    shape = [1] * vol.ndim
    shape[axis] = new_len
    w = w.reshape(shape)
    return w * lo_v.astype(dtype) + (1. - w) * hi_v.astype(dtype)


def resize_separable(vol, new_shape, method='linear', impl='take',
                     precision=jax.lax.Precision.HIGHEST):
    """
    Resize the leading len(new_shape) axes of `vol` to `new_shape`.

    Trailing axes (channels, etc.) are untouched. Numerically identical to
    `utils.interpn(vol, ndgrid(linspace...), method)` — the factorized form of
    the same trilinear sum.

    Args:
        vol: [*spatial, *trailing] array.
        new_shape: target sizes for the leading axes.
        method: 'linear' or 'nearest'.
        impl: 'take' (exact fp32 fma of two contiguous gathers; default) or
            'matmul' (MXU path; `precision` controls the f32 passes).
        precision: matmul precision (matmul impl only). HIGHEST keeps the
            1e-5 numerics contract; lower it for raw speed.
    """
    assert method in ('linear', 'nearest'), method
    out = vol if jnp.issubdtype(jnp.asarray(vol).dtype, jnp.floating) \
        else jnp.asarray(vol, jnp.float32)
    # process axes largest-shrink first to minimize intermediate volume size
    order = sorted(range(len(new_shape)),
                   key=lambda d: new_shape[d] / vol.shape[d])
    for d in order:
        if out.shape[d] == new_shape[d]:
            # linspace(0, n-1, n) hits exact integers: identity — skip
            continue
        if impl == 'matmul':
            out = _apply_axis_matmul(out, int(new_shape[d]), d, method,
                                     precision)
        else:
            out = _apply_axis_take(out, int(new_shape[d]), d, method)
    return out
