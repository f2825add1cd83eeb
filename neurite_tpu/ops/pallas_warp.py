"""
Pallas TPU kernel for the block-windowed warp (the `interpn` hot path).

The XLA one-hot engine (`ops.warp.interpn_onehot`) already avoids scattered
gathers by fetching each block's source window with a dynamic slice and
selecting taps via one-hot MXU matmuls — but it pays (a) HBM materialization
of the blockified index/weight fields, (b) `lax.scan` serialization across
blocks, and (c) a [P, K] one-hot whose output lands points-on-sublanes,
forcing a relayout. This kernel keeps the same math with Pallas-native
structure (reference algorithm: `neurite/tf/utils/utils.py:73-220`):

  - grid over (batch, z-blocks, y-blocks); per block the (Sz, Sy, W) source
    window is DMA'd HBM->VMEM with *scalar-prefetched* dynamic starts (the
    per-block minimum source index, computed in a cheap XLA pre-pass) —
    dynamic starts make global translations of any size exact for free;
  - the slab is transposed once per block to [W, K] (K = Sz*Sy);
  - per output row s, the 4 (z, y) corner taps of all W points ride ONE
    MXU matmul  C_s[w, k] = slabT[w, r] @ ohT_s[r, k]  whose N dim is the
    lane axis (x) — every layout is natural, no relayouts;
  - the two x taps reduce C_s over sublanes with masked weights.

Exactness contract: identical to `interpn_onehot` — exact whenever each
block's within-block source spread fits the static window (guaranteed for
|loc - grid| <= max_disp per axis); beyond-window points clamp to the edge.
`ops.warp.interpn_window` composes this (or the XLA engine) with a runtime
spread guard + gather fallback for unbounded-exact semantics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z0_ref, y0_ref, loz_ref, loy_ref, lox_ref, wz_ref, wy_ref,
            wx_ref, vol_ref, out_ref, slab, sem, *, Sz, Sy, bz, by, W, D, H,
            linear):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    z0 = z0_ref[b, iz, iy]
    y0 = y0_ref[b, iz, iy]

    dma = pltpu.make_async_copy(
        vol_ref.at[b, pl.ds(z0, Sz), pl.ds(y0, Sy), :], slab, sem)
    dma.start()
    dma.wait()

    K = Sz * Sy
    slabT = jnp.swapaxes(slab[:].reshape(K, W), 0, 1)       # [W, K]

    need = 2 if linear else 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)

    def row(s, _):
        si = s // by
        sj = s % by
        loz = loz_ref[0, si, sj, :].reshape(1, W)
        loy = loy_ref[0, si, sj, :].reshape(1, W)
        lox = lox_ref[0, si, sj, :].reshape(1, W)
        zl = jnp.clip(loz - z0, 0, max(Sz - need, 0))
        yl = jnp.clip(loy - y0, 0, max(Sy - need, 0))
        r00 = zl * Sy + yl                                   # [1, W]
        if linear:
            wz = wz_ref[0, si, sj, :].reshape(1, W)
            wy = wy_ref[0, si, sj, :].reshape(1, W)
            ohT = ((iota_r == r00) * (1 - wz) * (1 - wy)
                   + (iota_r == r00 + 1) * (1 - wz) * wy
                   + (iota_r == r00 + Sy) * wz * (1 - wy)
                   + (iota_r == r00 + Sy + 1) * wz * wy)
        else:
            ohT = (iota_r == r00).astype(jnp.float32)
        c = jax.lax.dot_general(
            slabT, ohT, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [W, W]
        xl = jnp.clip(lox, 0, max(W - need, 0))
        if linear:
            wx = wx_ref[0, si, sj, :].reshape(1, W)
            selT = (iota_w == xl) * (1 - wx) + (iota_w == xl + 1) * wx
        else:
            selT = (iota_w == xl).astype(jnp.float32)
        out_ref[0, si, sj, :] = jnp.sum(c * selT, axis=0)
        return _

    jax.lax.fori_loop(0, bz * by, row, 0)


@functools.partial(jax.jit, static_argnames=('Sz', 'Sy', 'bz', 'by',
                                             'linear', 'interpret'))
def _warp_p(vol, loz, loy, lox, wz, wy, wx, z0, y0, *, Sz, Sy, bz, by,
            linear, interpret=False):
    B, D, H, W = vol.shape
    _, Do, Ho, _ = loz.shape
    nbz, nby = Do // bz, Ho // by

    kern = functools.partial(_kernel, Sz=Sz, Sy=Sy, bz=bz, by=by, W=W, D=D,
                             H=H, linear=linear)
    blk = lambda b, i, j, *_: (b, i, j, 0)                   # noqa: E731
    fld = pl.BlockSpec((1, bz, by, W), blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nbz, nby),
        in_specs=[fld, fld, fld, fld, fld, fld,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bz, by, W), blk),
        scratch_shapes=[pltpu.VMEM((Sz, Sy, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Do, Ho, W), jnp.float32),
        interpret=interpret,
    )(z0, y0, loz, loy, lox, wz, wy, wx, vol)


# ---------------------------------------------------------------------------
# v2: VPU gather/select kernel (round 3)
#
# The v1 kernel above selects the 4 (z, y) corner taps with one [W, K] @
# [K, W] one-hot MXU matmul per output row — 2*K*W flops per point for ~8
# useful MACs. v2 drops the matmuls:
#
#   - per-point x taps ride within-vreg lane gathers (`take_along_axis` on
#     [by, W] tiles — Mosaic's single-vreg tpu.dynamic_gather). x-selection
#     MUST come first (on raw slab rows): the z/y masks carry each point's
#     own corner weights, so any post-aggregation x shift would mix values
#     formed with the wrong lanes' weights;
#   - the (z, y) window taps reduce by masked fma with HAT-function masks
#     `relu(1 - |cl - row|)` (exactly the reference corner weights incl.
#     the corner-collapse clipping, computed straight from the clipped
#     float location — no int fields needed);
#   - the y window is SHEARED: slice k of a slab z-plane holds, on sublane
#     j, slab row j + k — so each output row's own window rows align with
#     its sublane and a window of q = 2*ceil(max_disp) + 2 slices covers
#     every point (half the pair count of a block-wide window, and the
#     gather input needs no broadcast);
#   - windows are STATIC: the volume is pre-padded by max_disp so block
#     (iz, iy) reads rows [iz*bz, ·) / [iy*by, ·) — no scalar prefetch, no
#     block-minimum pre-pass. Slab DMAs double-buffer across the
#     sequential grid.
#
# Contract (differs from v1): exact iff per-axis |floor(clip(loc)) - grid|
# <= max_disp for z and y (x is unconstrained — full-row gathers). Global
# z/y translations are NOT absorbed (v1's dynamic window starts were);
# `interpn_window` guards displacement and falls back to the exact gather
# chain. Out-of-window corners contribute zero (not edge-clamped).
# Measured numbers: docs/DESIGN.md.
# ---------------------------------------------------------------------------


def _gather_prep(idx, W):
    """Precompute the panel-split gather's per-panel relative indices and
    selection masks (W > 128). These depend only on the x index field — NOT
    on the gathered rows — so the kernel hoists them out of the (sz, k)
    window loops: the r4 form recomputed clip/sub/compare per gather call,
    ~3x the vector-op budget of the gathers themselves at W=160 (the
    measured 0.56 Gvox/s panel-path cliff, VERDICT r4 #4a)."""
    if W <= 128:
        return [(idx, None)]
    P = W // 128
    prep = []
    for o in range(P):
        idx_o = idx[:, o * 128:(o + 1) * 128]
        pv = []
        for v in range(P):
            rel = jnp.clip(idx_o - v * 128, 0, 127)
            sel = (idx_o >= v * 128) & (idx_o < (v + 1) * 128)
            pv.append((rel, sel))
        prep.append(pv)
    return prep


def _gather_lanes(rows, prep, W):
    """Per-lane gather `out[j, w] = rows[j, idx[j, w]]` using indices
    prepared by `_gather_prep`. W <= 128 is ONE single-vreg
    tpu.dynamic_gather (Mosaic's only gather shape); W > 128 splits source
    AND output into 128-lane panels — per (output, source) panel pair one
    matched [sub, 128] gather, zero-masked and summed (each index selects
    exactly one panel, so the sum IS the select)."""
    if W <= 128:
        return jnp.take_along_axis(rows, prep[0][0], axis=1)
    P = W // 128
    outs = []
    for o in range(P):
        acc = None
        for v in range(P):
            panel = rows[:, v * 128:(v + 1) * 128]
            rel, sel = prep[o][v]
            g = jnp.where(sel, jnp.take_along_axis(panel, rel, axis=1), 0.)
            acc = g if acc is None else acc + g
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _kernel_v2(clz_ref, cly_ref, clx_ref, vol_ref, out_ref, slab, sem, *,
               Sz, Sy, bz, by, W, md, q, linear):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    nbz = pl.num_programs(1)
    nby = pl.num_programs(2)
    i = (b * nbz + iz) * nby + iy
    n = pl.num_programs(0) * nbz * nby
    slot = jax.lax.rem(i, 2)

    def issue(j, slot):
        jb = j // (nbz * nby)
        jz = (j // nby) % nbz
        jy = jax.lax.rem(j, nby)
        dma = pltpu.make_async_copy(
            vol_ref.at[jb, pl.ds(jz * bz, Sz), pl.ds(jy * by, Sy), :],
            slab.at[slot], sem.at[slot])
        dma.start()
        return dma

    @pl.when(i == 0)
    def _():
        issue(i, slot)

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, 1 - slot)

    # wait on this block's slab (re-constructing the copy descriptor is the
    # documented way to wait for a DMA started in an earlier grid step)
    pltpu.make_async_copy(
        vol_ref.at[b, pl.ds(iz * bz, Sz), pl.ds(iy * by, Sy), :],
        slab.at[slot], sem.at[slot]).wait()

    jio = jax.lax.broadcasted_iota(jnp.int32, (by, W), 0).astype(jnp.float32)

    # STATIC group unroll (r4): output z-plane si only reads slab z rows
    # [si, si + 2*md + 2) — restricting the sz loop to the group's own
    # window (instead of all Sz = bz + 2*md + 1 slices) drops the per-point
    # gather count from Sz*q to (2*md+2)*q, and larger bz blocks now
    # amortize slab DMA bytes without extra compute.
    qz = 2 * md + 2
    for si in range(bz):
        clz = clz_ref[0, si]                                     # [by, W]
        cly = cly_ref[0, si]
        clx = clx_ref[0, si]
        # continuous locations in window coordinates (exact f32: single
        # subtraction of a small-integer constant)
        czr = clz - (iz * bz - md).astype(jnp.float32)
        cyr = cly - (iy * by - md) - jio
        if linear:
            xl = jnp.clip(clx.astype(jnp.int32), 0, max(W - 2, 0))
            wx = clx - xl.astype(jnp.float32)
            xl1 = jnp.minimum(xl + 1, W - 1)
            prep1 = _gather_prep(xl1, W)
        else:
            xl = clx.astype(jnp.int32)                 # pre-rounded field
        prep0 = _gather_prep(xl, W)
        # hat masks = the reference corner weights (nearest fields are
        # pre-rounded, so the hat is 1 exactly at the chosen row)
        mys = [jnp.maximum(1. - jnp.abs(cyr - k), 0.) for k in range(q)]
        acc0 = jnp.zeros((by, W), jnp.float32)
        acc1 = jnp.zeros((by, W), jnp.float32)
        for sz in range(si, min(si + qz, Sz)):
            mz = jnp.maximum(1. - jnp.abs(czr - sz), 0.)
            tile = slab[slot, sz]                                # [Sy, W]
            t0 = jnp.zeros((by, W), jnp.float32)
            t1 = jnp.zeros((by, W), jnp.float32)
            for k in range(q):
                # sheared slice: sublane j holds slab row j + k — each
                # output row gathers from its own window row, no broadcast
                rows = tile[k:k + by]
                t0 = t0 + mys[k] * _gather_lanes(rows, prep0, W)
                if linear:
                    t1 = t1 + mys[k] * _gather_lanes(rows, prep1, W)
            acc0 = acc0 + mz * t0
            if linear:
                acc1 = acc1 + mz * t1
        out_ref[0, si] = (1. - wx) * acc0 + wx * acc1 if linear else acc0


@functools.partial(jax.jit, static_argnames=('Sz', 'Sy', 'bz', 'by', 'md',
                                             'q', 'linear', 'interpret'))
def _warp_p2(volp, clz, cly, clx, *, Sz, Sy, bz, by, md, q, linear,
             interpret=False):
    B = volp.shape[0]
    W = volp.shape[3]
    _, Do, Ho, _ = clz.shape
    nbz, nby = Do // bz, Ho // by

    kern = functools.partial(_kernel_v2, Sz=Sz, Sy=Sy, bz=bz, by=by, W=W,
                             md=md, q=q, linear=linear)
    blk = lambda b, i, j: (b, i, j, 0)                       # noqa: E731
    fld = pl.BlockSpec((1, bz, by, W), blk)
    grid_spec = pl.GridSpec(
        grid=(B, nbz, nby),
        in_specs=[fld, fld, fld, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bz, by, W), blk),
        scratch_shapes=[pltpu.VMEM((2, Sz, Sy, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Do, Ho, W), jnp.float32),
        interpret=interpret,
    )(clz, cly, clx, volp)


def interpn_pallas(vol, loc, interp_method='linear', fill_value=None,
                   max_disp=4.0, block=(8, 8), interpret=False,
                   version='v2'):
    """
    3-D warp on the Pallas windowed kernel. Same contract as
    `ops.warp.interpn_onehot` with an untiled x axis: exact while per-axis
    |loc - grid| <= max_disp (dynamic windows absorb global z/y
    translations); C=1 volumes; W must be a multiple of 128 (callers pad or
    fall back).

    version: 'v2' (default) = the VPU select-accumulate kernel (per-point x
        taps via within-vreg lane gathers, (z, y) taps via masked fma over
        the window — same exactness contract as v1). 'v1' = the one-hot MXU
        kernel.

    Differentiable: the custom VJP rides the exact gather chain
    (`utils.interpn`), whose value — and therefore gradient — matches the
    kernel whenever the window contract holds.

    vol: [D, H, W] or [B, D, H, W], optionally with a trailing channel axis
    (shape disambiguated by loc.ndim); loc: [*out, 3] or [B, *out, 3].
    Channels fold into the kernel's batch grid dim (each channel warps with
    the same loc) — the loc-derived fields are repeated per channel, so loc
    traffic scales with C; profitable for small C.
    """
    if isinstance(loc, (list, tuple)):
        loc = jnp.stack(loc, -1)
    vol = jnp.asarray(vol)
    loc = jnp.asarray(loc)
    batched = loc.ndim == 5
    has_ch = vol.ndim == (5 if batched else 4)
    if not has_ch:
        return _interpn_pallas_ad(vol, loc, interp_method, fill_value,
                                  float(max_disp), tuple(block),
                                  bool(interpret), version)
    # fold channels into the batch grid dim
    vb = vol if batched else vol[None]
    lb = loc if batched else loc[None]
    B, C = vb.shape[0], vb.shape[-1]
    vf = jnp.moveaxis(vb, -1, 1).reshape((B * C,) + vb.shape[1:-1])
    lf = jnp.repeat(lb, C, axis=0)
    out = _interpn_pallas_ad(vf, lf, interp_method, fill_value,
                             float(max_disp), tuple(block), bool(interpret),
                             version)
    out = jnp.moveaxis(out.reshape((B, C) + out.shape[1:]), 1, -1)
    return out if batched else out[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _interpn_pallas_ad(vol, loc, interp_method, fill_value, max_disp, block,
                       interpret, version='v2'):
    return _interpn_pallas_impl(vol, loc, interp_method, fill_value,
                                max_disp, block, interpret, version)


def _interpn_pallas_ad_fwd(vol, loc, interp_method, fill_value, max_disp,
                           block, interpret, version='v2'):
    out = _interpn_pallas_impl(vol, loc, interp_method, fill_value, max_disp,
                               block, interpret, version)
    return out, (vol, loc)


def _interpn_pallas_ad_bwd(interp_method, fill_value, max_disp, block,
                           interpret, version, res, g):
    from neurite_tpu.utils import core
    vol, loc = res

    def f(v, l):
        return core.interpn(v, l, interp_method=interp_method,
                            fill_value=fill_value)

    fn = jax.vmap(f) if loc.ndim == 5 else f
    _, vjp = jax.vjp(fn, vol.astype(jnp.float32), loc.astype(jnp.float32))
    dv, dl = vjp(g.astype(jnp.float32))
    return dv.astype(vol.dtype), dl.astype(loc.dtype)


_interpn_pallas_ad.defvjp(_interpn_pallas_ad_fwd, _interpn_pallas_ad_bwd)


def _interpn_pallas_impl(vol, loc, interp_method, fill_value, max_disp,
                         block, interpret, version='v2'):
    assert loc.shape[-1] == 3, 'interpn_pallas is the 3-D engine'
    vol = jnp.asarray(vol)
    batched = loc.ndim == 5
    if not batched:
        assert loc.ndim == 4, loc.shape
        vol, loc = vol[None], loc[None]
    assert vol.ndim == 4, 'interpn_pallas takes single-channel volumes'
    B, D, H, W = vol.shape
    assert interp_method in ('linear', 'nearest'), interp_method
    linear = interp_method == 'linear'
    out_dtype = vol.dtype
    vol32 = vol.astype(jnp.float32)
    loc32 = jnp.asarray(loc, jnp.float32)

    maxl = jnp.asarray([D - 1., H - 1., W - 1.], jnp.float32)
    cl = jnp.clip(loc32, 0., maxl)
    if linear:
        lo = jnp.clip(jnp.floor(cl), 0., jnp.maximum(maxl - 1., 0.))
        w = cl - lo
    else:
        lo = jnp.round(cl)
        w = jnp.zeros_like(cl)
    lo_i = lo.astype(jnp.int32)

    bz, by = block[0], block[1]
    # Mosaic block constraint: the field blocks' last two dims are (by, W),
    # so by must be sublane-aligned on real TPUs
    assert interpret or by % 8 == 0, \
        f'by={by} must be a multiple of 8 (Mosaic sublane tiling)'
    Do, Ho, Wo = loc.shape[1:-1]
    assert Wo == W, 'x axis is untiled: out x extent must equal W'
    pz, py = (-Do) % bz, (-Ho) % by
    nbz, nby = (Do + pz) // bz, (Ho + py) // by
    # lane padding: x extents that are not a multiple of 128 are edge-padded
    # here (inside the custom-vjp boundary — the clip above already used the
    # true extents, and padded lanes are sliced off below). W > 128 rides
    # panel-split lane gathers (`_gather_lanes`, cost linear in W/128);
    # beyond 512 the quadratic gather count loses to v1 (the
    # `interpn_window` router makes the same choice).
    px = (-W) % 128
    if version == 'v2' and W + px > 512:
        version = 'v1'

    if version == 'v2':
        md = int(np.ceil(float(max_disp)))
        q = 2 * md + 2
        Sz = bz + 2 * md + 1
        Sy = -(-(by + q - 1) // 8) * 8
        cl2 = cl if linear else lo
        if pz or py:
            cl2 = jnp.pad(cl2, [(0, 0), (0, pz), (0, py), (0, 0), (0, 0)],
                          mode='edge')
        # static windows: block (iz, iy) reads padded rows [iz*bz, +Sz) /
        # [iy*by, +Sy); the pad realigns so window row 0 = out - max_disp
        zhi = max(0, (nbz - 1) * bz + Sz - (D + md))
        yhi = max(0, (nby - 1) * by + Sy - (H + md))
        volp = jnp.pad(vol32, ((0, 0), (md, zhi), (md, yhi), (0, px)))
        if px:
            cl2 = jnp.pad(cl2, [(0, 0), (0, 0), (0, 0), (0, px), (0, 0)],
                          mode='edge')
        out = _warp_p2(volp, cl2[..., 0], cl2[..., 1], cl2[..., 2],
                       Sz=Sz, Sy=Sy, bz=bz, by=by, md=md, q=q,
                       linear=linear, interpret=interpret)
    else:
        pad = int(np.ceil(float(max_disp))) + 1
        Sz, Sy = min(bz + 2 * pad, D), min(by + 2 * pad, H)
        if pz or py or px:
            cfg = [(0, 0), (0, pz), (0, py), (0, px), (0, 0)]
            lo_i = jnp.pad(lo_i, cfg, mode='edge')
            w = jnp.pad(w, cfg, mode='edge')
        if px:
            vol32 = jnp.pad(vol32, ((0, 0), (0, 0), (0, 0), (0, px)))
        # per-block window starts: the block's own min source index (XLA
        # pre-pass; tiny [B, nbz, nby] arrays ride the scalar-prefetch path)
        lz = lo_i[..., 0].reshape(B, nbz, bz, nby, by, W + px)
        ly = lo_i[..., 1].reshape(B, nbz, bz, nby, by, W + px)
        z0 = jnp.clip(lz.min(axis=(2, 4, 5)), 0, max(D - Sz, 0))
        y0 = jnp.clip(ly.min(axis=(2, 4, 5)), 0, max(H - Sy, 0))
        out = _warp_p(vol32, lo_i[..., 0], lo_i[..., 1], lo_i[..., 2],
                      w[..., 0], w[..., 1], w[..., 2],
                      z0.astype(jnp.int32), y0.astype(jnp.int32),
                      Sz=Sz, Sy=Sy, bz=bz, by=by, linear=linear,
                      interpret=interpret)
    out = out[:, :Do, :Ho, :Wo]

    if fill_value is not None:
        oob = jnp.any((loc32 < 0.) | (loc32 > maxl), axis=-1)
        out = jnp.where(oob, jnp.asarray(fill_value, out.dtype), out)
    if not jnp.issubdtype(out_dtype, jnp.floating):
        out = jnp.round(out).astype(out_dtype)
    elif out.dtype != out_dtype:
        out = out.astype(out_dtype)
    return out if batched else out[0]
