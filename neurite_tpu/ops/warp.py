"""
General (non-separable) N-D warp interpolation, TPU-optimized formulations.

The reference `interpn` (`neurite/tf/utils/utils.py:73-220`) issues 2^N
independent full-volume gathers with per-corner flat index math. On TPU the
gathers dominate. Here the 2^N corners are fetched with ONE `lax.gather`
pulling a contiguous 2x..x2 cube per output point (the corners of a voxel are
adjacent in memory, so each slice is a local read), then reduced axis-by-axis
with fused fma passes. Output is numerically identical to `utils.interpn`
(same clipping and corner-weight convention) — parity-tested.
"""

import jax
import jax.numpy as jnp
import numpy as np


def interpn_rows(vol, loc, interp_method='linear', fill_value=None):
    """
    3-D warp via ROW gathers: fetch the full contiguous x-row (lane axis) for
    each of the 4 (z,y) corner combinations with `jnp.take` — 512-byte
    coalesced reads instead of the reference's per-element 4-byte gathers
    (`neurite/tf/utils/utils.py:162-191`) — then select/lerp the two x
    corners within lanes via `take_along_axis`. Exactly matches
    `utils.interpn` numerics (same clipping/corner-weight convention;
    parity-tested).

    NOTE measured on a v5e chip at 128^3 this LOSES to the flat 8-gather
    (274ms vs 133ms at C=1, 976ms vs 104ms at C=3): the full-row fetches
    waste 126/128 lanes per corner and the lane-selects are themselves
    gathers. Kept as an `impl='rows'` option — the trade-off can flip on
    other topologies (e.g. wide-C volumes where rows are fully used).

    vol: [D, H, W] or [D, H, W, C]; loc: [*out_shape, 3] or list of 3.
    """
    if isinstance(loc, (list, tuple)):
        loc = jnp.stack(loc, -1)
    assert loc.shape[-1] == 3, 'interpn_rows is the 3-D fast path'
    vol = jnp.asarray(vol)
    squeeze_channel = vol.ndim == 3
    if squeeze_channel:
        vol = vol[..., None]
    D, H, W, C = vol.shape
    if not jnp.issubdtype(loc.dtype, jnp.floating):
        loc = loc.astype(jnp.float32)
    fd = loc.dtype
    if jnp.issubdtype(vol.dtype, jnp.floating) and vol.dtype != fd:
        loc = loc.astype(vol.dtype)
        fd = vol.dtype

    out_sp = loc.shape[:-1]
    maxl = jnp.asarray([D - 1, H - 1, W - 1], fd)
    locc = jnp.clip(loc, 0., maxl)
    vol2d = vol.reshape(D * H, W * C)
    n = int(np.prod(out_sp)) if out_sp else 1

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n, C), 1)

    if interp_method == 'nearest':
        r = jnp.round(locc)
        zr = r[..., 0].astype(jnp.int32).ravel()
        yr = r[..., 1].astype(jnp.int32).ravel()
        xr = r[..., 2].astype(jnp.int32).ravel()
        rows = jnp.take(vol2d, zr * H + yr, axis=0)
        out = jnp.take_along_axis(rows, xr[:, None] * C + lane_iota, axis=1)
    else:
        assert interp_method == 'linear', interp_method
        l0 = jnp.floor(locc)
        z0 = jnp.clip(l0[..., 0], 0, D - 1).astype(jnp.int32).ravel()
        y0 = jnp.clip(l0[..., 1], 0, H - 1).astype(jnp.int32).ravel()
        x0 = jnp.clip(l0[..., 2], 0, W - 1).astype(jnp.int32).ravel()
        z1 = jnp.minimum(z0 + 1, D - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        # corner-0 weight = clip(corner1) - clip(loc); equals 1 at the top
        # edge where both corners collapse (same value either way)
        wz = jnp.where(z1 == z0, 1., z1.astype(fd) - locc[..., 0].ravel())
        wy = jnp.where(y1 == y0, 1., y1.astype(fd) - locc[..., 1].ravel())
        wx = jnp.where(x1 == x0, 1., x1.astype(fd) - locc[..., 2].ravel())

        lane0 = x0[:, None] * C + lane_iota
        lane1 = x1[:, None] * C + lane_iota
        wxc = wx[:, None]

        def row_interp(ridx):
            rows = jnp.take(vol2d, ridx, axis=0)         # [N, W*C]
            v0 = jnp.take_along_axis(rows, lane0, axis=1)
            v1 = jnp.take_along_axis(rows, lane1, axis=1)
            return wxc * v0 + (1. - wxc) * v1            # [N, C]

        v00 = row_interp(z0 * H + y0)
        v01 = row_interp(z0 * H + y1)
        v10 = row_interp(z1 * H + y0)
        v11 = row_interp(z1 * H + y1)
        wzc = wz[:, None]
        wyc = wy[:, None]
        out = (wzc * (wyc * v00 + (1. - wyc) * v01)
               + (1. - wzc) * (wyc * v10 + (1. - wyc) * v11))

    out = out.reshape(out_sp + (C,))
    if fill_value is not None:
        oob = jnp.any((loc < 0.) | (loc > maxl), axis=-1, keepdims=True)
        out = jnp.where(oob, jnp.asarray(fill_value, out.dtype), out)
    if squeeze_channel:
        out = out[..., 0]
    return out


def interpn_cube(vol, loc, interp_method='linear', fill_value=None):
    """
    Drop-in equivalent of `utils.interpn` using a single cube gather.

    vol: [*spatial, C] or [*spatial]; loc: [*out_shape, N] or list of N arrays.
    Requires every spatial dim >= 2 (true for all real volumes).
    """
    assert interp_method == 'linear', 'interpn_cube is the linear path'
    if isinstance(loc, (list, tuple)):
        loc = jnp.stack(loc, -1)
    nd = loc.shape[-1]
    vol = jnp.asarray(vol)
    squeeze_channel = vol.ndim == nd
    if squeeze_channel:
        vol = vol[..., None]
    assert vol.ndim == nd + 1, (vol.shape, nd)
    spatial = vol.shape[:-1]
    assert all(s >= 2 for s in spatial), 'cube gather needs dims >= 2'

    if not jnp.issubdtype(loc.dtype, jnp.floating):
        loc = loc.astype(jnp.float32)
    fdtype = loc.dtype

    out_shape = loc.shape[:-1]
    flat_loc = loc.reshape(-1, nd)

    max_loc = jnp.asarray([d - 1 for d in spatial], fdtype)
    clipped = jnp.clip(flat_loc, 0., max_loc)
    # lo clipped to max-1 so the +1 corner of the cube is always in bounds;
    # w_hi = clipped - lo reproduces interpn's per-corner clipping exactly.
    lo = jnp.clip(jnp.floor(flat_loc), 0., max_loc - 1.)
    w_hi = clipped - lo                     # [P, nd] in [0, 1]
    lo_idx = lo.astype(jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(range(1, nd + 2)),
        collapsed_slice_dims=(),
        start_index_map=tuple(range(nd)),
    )
    cube = jax.lax.gather(
        vol, lo_idx, dnums,
        slice_sizes=(2,) * nd + (vol.shape[-1],),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP)  # [P, 2,...,2, C]

    out = cube.astype(fdtype) if cube.dtype != fdtype else cube
    # reduce the cube one axis at a time: axis 1 always holds the next dim
    for d in range(nd):
        w = w_hi[:, d].reshape((-1,) + (1,) * (out.ndim - 2))
        out = (1. - w) * out[:, 0] + w * out[:, 1]

    out = out.reshape(out_shape + (vol.shape[-1],))

    if fill_value is not None:
        oob = jnp.any((loc < 0.) | (loc > max_loc), axis=-1, keepdims=True)
        out = jnp.where(oob, jnp.asarray(fill_value, out.dtype), out)

    if squeeze_channel:
        out = out[..., 0]
    return out
