"""
Pallas locally-connected conv v2 — transposed weight layout, halo-DMA blocks.

Reference: `neurite/tf/layers.py:811-1532` (LocallyConnected3D). The v1
kernel (`ops/pallas_lc.py`) issues 27 per-tap `make_async_copy`s per block;
`benchmarks/pallas_lc_probe.py` shows this pool's remote Mosaic compiler
rejects EVERY multi-DMA kernel (HTTP 500) while single-DMA + BlockSpec
kernels compile — the exact pattern the windowed-warp v2 kernel
(`ops/pallas_warp.py`) already runs in production. v2 re-builds LC on that
pattern, for the transposed kernel storage the layer now uses
(`ops/lc_tap.py`: [O, prod(k)*C, V], every tap row lane-dense):

- grid over (z-plane, y-band) output blocks;
- the kernel block [TC, 1, by, W] and output block [1, by, W] ride
  automatic BlockSpec pipelining (kernel bytes stream exactly once — the
  bandwidth floor of a 447M-param head);
- the x halo [C, kz, by+ky-1, W+kx-1] is ONE double-buffered DMA per block
  from the zero-pre-padded channel-major volume (SAME edges are exact by
  construction, no masks);
- compute is a pure-VPU fma pyramid: for each of the prod(k)*C tap rows,
  a statically-shifted slab view times the dense kernel row, f32
  accumulation.

The backward splits: dk (the 99.9%-of-bytes cotangent) is the SAME kernel
shape with `g * x_tap` in place of the accumulate — written natively in the
transposed layout by `_dk` below; dx is tiny (x-sized) and uses the
hand-written V-major tap folds (`lc_tap.lc_transposed_dx` — XLA's
auto-transpose chose C-on-lanes layouts with 32x tile padding).

Supported fast path: 3-D, stride 1, padding 'same', odd kernel, filters
ride an in-block output loop bounded by VMEM + a 512-term unroll cap
(`supported`), H divisible by a usable y-band. Callers (`layers/local.py`)
route everything else to the XLA forms. Measured numbers: docs/DESIGN.md
"LC head".
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurite_tpu.ops import lc_tap


def supported(x_shape, kernel_size, filters, strides, padding,
              k_bytes=4):
    """True when (B, D, H, W, C) x can take the v2 Pallas fast path.

    filters > 1 rides the same kernel with an in-block output loop (r4);
    the limit is VMEM: the double-buffered [O*TC, by, W] kernel block +
    the halo slab must fit the ~16 MB v5e budget.
    """
    if len(x_shape) != 5 or filters < 1:
        return False
    if padding != 'same' or any(s != 1 for s in strides):
        return False
    if len(kernel_size) != 3 or any(k % 2 == 0 for k in kernel_size):
        return False
    b, d, h, w, c = x_shape
    # Mosaic DMA offsets on the sublane dim must be 8-aligned: the real
    # path requires an 8-multiple y band (by=8); other extents fall back
    # to the XLA transposed form (interpret-mode direct calls may use any
    # _pick_by divisor).
    if h % 8 != 0:
        return False
    kz, ky, kx = kernel_size
    tc = kz * ky * kx * c
    # the fma pyramid is a static unroll of O*TC terms — cap it so the
    # remote Mosaic compile stays tractable (C<=16 @ O=1 was the proven
    # round-3 envelope = 432 terms)
    if filters * tc > 512:
        return False
    by = 8
    wp = -(-(w + kx - 1) // 128) * 128
    sy = -(-(by + ky - 1) // 8) * 8
    vmem = (2 * filters * tc * by * w * k_bytes      # kernel block (dbuf)
            + 2 * c * kz * sy * wp * k_bytes         # halo slab (dbuf)
            + 2 * filters * by * w * 4               # out block (dbuf)
            + 2 * max(filters, tc) * by * w * 4)     # g block / headroom
    return vmem <= 10 * 2 ** 20


def _pick_by(H):
    """y-band height: sublane-friendly divisor of H."""
    for by in (8, 16, 10, 5, 4, 6, 3, 2, 1):
        if H % by == 0 and by <= H:
            return by
    return None


def _y_geometry(H, by, ky, interpret):
    """Slab y-extent and xp y-padding.

    Mosaic requires DMA slices on the sublane (second-minor) dim to be
    8-aligned in offset and size: the y offsets are jy*by (by=8 on the real
    path), and the slab extent Sy = by + ky - 1 rounds up to a multiple of
    8, with the volume zero-padded so the last band's slab stays in bounds
    (the extra rows are dead pad the kernel never multiplies in).
    """
    Sy = by + ky - 1
    if not interpret:
        Sy = -(-Sy // 8) * 8
    nby = H // by
    pad_lo = ky // 2
    pad_hi = (nby - 1) * by + Sy - pad_lo - H
    return Sy, pad_lo, max(pad_hi, ky // 2)


def _x_geometry(W, kx, interpret):
    """Slab lane extent and xp x-padding (DMA lane shapes must be
    128-aligned on Mosaic; the dead pad lanes are never multiplied in)."""
    Wp = W + kx - 1
    if not interpret:
        Wp = -(-Wp // 128) * 128
    return Wp, kx // 2, Wp - W - kx // 2


def _fwd_kernel(k_ref, xp_ref, o_ref, slab, sem, *, C, O, TC, ks, by, W, Wp,
                n, Sy):
    kz, ky, kx = ks
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    nby = pl.num_programs(1)
    i = iz * nby + iy
    slot = jax.lax.rem(i, 2)

    def issue(j, slot):
        jz = j // nby
        jy = jax.lax.rem(j, nby)
        dma = pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(jz, kz), pl.ds(jy * by, Sy), :],
            slab.at[slot], sem.at[slot])
        dma.start()
        return dma

    @pl.when(i == 0)
    def _():
        issue(i, slot)

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, 1 - slot)

    pltpu.make_async_copy(
        xp_ref.at[:, pl.ds(iz, kz), pl.ds(iy * by, Sy), :],
        slab.at[slot], sem.at[slot]).wait()

    accs = [jnp.zeros((by, W), jnp.float32) for _ in range(O)]
    t = 0
    for dz in range(kz):
        for dy in range(ky):
            rows = slab[slot, :, dz, dy:dy + by, :]      # [C, by, Wp]
            for dx in range(kx):
                xs = rows[:, :, dx:dx + W].astype(jnp.float32)
                for c in range(C):
                    # the tap slice is shared across the O outputs; only
                    # the kernel row differs (filters ride an in-block loop)
                    for o in range(O):
                        accs[o] = accs[o] + (
                            k_ref[o * TC + t * C + c, 0].astype(jnp.float32)
                            * xs[c])
                t += 1
    for o in range(O):
        o_ref[o, 0] = accs[o]


def _dk_kernel(g_ref, xp_ref, dk_ref, slab, sem, *, C, O, TC, ks, by, W, Wp,
               n, Sy):
    kz, ky, kx = ks
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    nby = pl.num_programs(1)
    i = iz * nby + iy
    slot = jax.lax.rem(i, 2)

    def issue(j, slot):
        jz = j // nby
        jy = jax.lax.rem(j, nby)
        dma = pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(jz, kz), pl.ds(jy * by, Sy), :],
            slab.at[slot], sem.at[slot])
        dma.start()
        return dma

    @pl.when(i == 0)
    def _():
        issue(i, slot)

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, 1 - slot)

    pltpu.make_async_copy(
        xp_ref.at[:, pl.ds(iz, kz), pl.ds(iy * by, Sy), :],
        slab.at[slot], sem.at[slot]).wait()

    gs = [g_ref[o, 0].astype(jnp.float32) for o in range(O)]  # [by, W] each
    t = 0
    for dz in range(kz):
        for dy in range(ky):
            rows = slab[slot, :, dz, dy:dy + by, :]       # [C, by, Wp]
            for dx in range(kx):
                xs = rows[:, :, dx:dx + W].astype(jnp.float32)
                for c in range(C):
                    for o in range(O):
                        dk_ref[o * TC + t * C + c, 0] = (
                            gs[o] * xs[c]).astype(dk_ref.dtype)
                t += 1


def _pallas_fwd(x1, kt, ks, interpret):
    """x1 [D, H, W, C], kt [O, TC, V] -> y [O, D, H, W] f32."""
    D, H, W, C = x1.shape
    O, TC = kt.shape[0], kt.shape[1]
    kz, ky, kx = ks
    by = _pick_by(H)
    nby = H // by
    n = D * nby
    Wp, xlo, xhi = _x_geometry(W, kx, interpret)
    Sy, pad_lo, pad_hi = _y_geometry(H, by, ky, interpret)
    xp = jnp.moveaxis(x1, -1, 0)                          # [C, D, H, W]
    xp = jnp.pad(xp, ((0, 0), (kz // 2, kz // 2), (pad_lo, pad_hi),
                      (xlo, xhi)))
    k4 = kt.reshape(O * TC, D, H, W)
    kern = functools.partial(_fwd_kernel, C=C, O=O, TC=TC, ks=ks, by=by,
                             W=W, Wp=Wp, n=n, Sy=Sy)
    return pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(D, nby),
            in_specs=[pl.BlockSpec((O * TC, 1, by, W),
                                   lambda i, j: (0, i, j, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((O, 1, by, W), lambda i, j: (0, i, j, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, C, kz, Sy, Wp), xp.dtype),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((O, D, H, W), jnp.float32),
        interpret=interpret,
    )(k4, xp)


def _pallas_dk(g1, x1, ks, k_dtype, interpret):
    """g1 [O, D, H, W] f32, x1 [D, H, W, C] -> dk [O, TC, V] in k_dtype."""
    D, H, W, C = x1.shape
    O = g1.shape[0]
    kz, ky, kx = ks
    by = _pick_by(H)
    nby = H // by
    n = D * nby
    Wp, xlo, xhi = _x_geometry(W, kx, interpret)
    TC = kz * ky * kx * C
    Sy, pad_lo, pad_hi = _y_geometry(H, by, ky, interpret)
    xp = jnp.moveaxis(x1, -1, 0)
    xp = jnp.pad(xp, ((0, 0), (kz // 2, kz // 2), (pad_lo, pad_hi),
                      (xlo, xhi)))
    kern = functools.partial(_dk_kernel, C=C, O=O, TC=TC, ks=ks, by=by,
                             W=W, Wp=Wp, n=n, Sy=Sy)
    dk = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(D, nby),
            in_specs=[pl.BlockSpec((O, 1, by, W), lambda i, j: (0, i, j, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((O * TC, 1, by, W),
                                   lambda i, j: (0, i, j, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, C, kz, Sy, Wp), xp.dtype),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((O * TC, D, H, W), k_dtype),
        interpret=interpret,
    )(g1, xp)
    return dk.reshape(O, TC, D * H * W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lc_transposed_pallas(x, kernel, kernel_size, interpret=False):
    """
    Locally-connected conv, Pallas v2 (stride 1, SAME, any filters within
    the `supported` VMEM/unroll envelope).

    x: [B, D, H, W, C]; kernel: [O, prod(k)*C, V] transposed layout
    (`ops/lc_tap.py`). Returns [B, D, H, W, O] float32.
    """
    y, _ = _fwd_impl(x, kernel, kernel_size, interpret)
    return y


def _fwd_impl(x, kernel, kernel_size, interpret):
    ys = [_pallas_fwd(x[b], kernel, tuple(kernel_size), interpret)
          for b in range(x.shape[0])]
    y = jnp.moveaxis(jnp.stack(ys, 0), 1, -1)             # [B, D, H, W, O]
    return y, (x, kernel)


def _fwd_rule(x, kernel, kernel_size, interpret):
    return _fwd_impl(x, kernel, kernel_size, interpret)


def _bwd_rule(kernel_size, interpret, res, g):
    x, kernel = res
    ks = tuple(kernel_size)
    g1 = jnp.moveaxis(g, -1, 1).astype(jnp.float32)       # [B, O, D, H, W]
    # dk: kernel-shaped (the bandwidth-dominant cotangent) on the Pallas
    # kernel, produced natively in the transposed layout. At B=1 the kernel
    # writes dk at param dtype directly (halves the write traffic of the
    # dominant cotangent for bf16 params, no accumulation happens); at B>1
    # per-sample dk comes out f32 so the batch sum accumulates at full
    # precision before the single cast to param dtype.
    B = x.shape[0]
    dk_dtype = kernel.dtype if B == 1 else jnp.float32
    dks = [_pallas_dk(g1[b], x[b], ks, dk_dtype, interpret)
           for b in range(B)]
    dk = dks[0] if len(dks) == 1 else functools.reduce(jnp.add, dks)
    dk = dk.astype(kernel.dtype)                          # [O, TC, V]
    # dx: x-sized (tiny next to dk) — the hand-written V-major tap folds
    # (lc_tap.lc_transposed_dx). XLA's auto-transpose of the jnp form put
    # the C axis on lanes (32x padded bf16 tiles, docs/DESIGN.md).
    dx = lc_tap.lc_transposed_dx(g, kernel, ks, 'same',
                                 x.shape).astype(x.dtype)
    return dx, dk


lc_transposed_pallas.defvjp(_fwd_rule, _bwd_rule)
