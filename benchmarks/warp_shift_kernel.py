"""
v2 windowed-warp kernel prototype (VERDICT r3 item 1): VPU select-over-shifts
with hat-function masks instead of one-hot MXU matmuls.

Per output point the one-hot engine pays 2*K*W MXU flops (K = window size,
W = 128 lanes) for ~8 useful MACs. This kernel pays ~Sz*Sy VPU fmas/point:

  stage Z: Bz[eta, sy, w] = sum_zeta slab[zeta, eta, w] * hat(tz - zeta)
  stage Y: C[sy, w]       = sum_eta  Bz[eta, sy, w]     * hat(ty - eta)
  stage X: out            = lerp of two lane-gathers (take_along_axis)

hat(u) = relu(1 - |u|) reproduces the reference's corner weights exactly
(t = clip(loc) continuous coordinate; integer part selects, fraction weights).

Usage: python benchmarks/warp_shift_kernel.py [bz,by ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
import neurite_tpu as ne  # noqa: E402


def _kernel(z0_ref, y0_ref, tz_ref, ty_ref, tx_ref, vol_ref, out_ref,
            slab, sem, *, Sz, Sy, bz, by, W):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    z0 = z0_ref[b, iz, iy]
    y0 = y0_ref[b, iz, iy]

    dma = pltpu.make_async_copy(
        vol_ref.at[b, pl.ds(z0, Sz), pl.ds(y0, Sy), :], slab, sem)
    dma.start()
    dma.wait()

    z0f = z0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)

    for s in range(bz):
        tz = tz_ref[0, s] - z0f                           # [by, W]
        ty = ty_ref[0, s] - y0f
        tx = tx_ref[0, s]
        # stage X FIRST: per-lane masks only commute with data that is
        # already at the output lane, so each slab row's two x taps are
        # gathered (lane-internal dynamic_gather) before any mask applies
        xl = jnp.clip(tx.astype(jnp.int32), 0, W - 2)
        xl1 = xl + 1
        wx = tx - xl.astype(jnp.float32)
        # stage Z: select/lerp the z axis for every y window row
        bzacc = [jnp.zeros((by, W), jnp.float32)] * Sy
        for zeta in range(Sz):
            mz = jnp.maximum(1. - jnp.abs(tz - float(zeta)), 0.)
            for eta in range(Sy):
                row = jnp.broadcast_to(slab[zeta, eta, :].reshape(1, W),
                                       (by, W))
                g0 = jnp.take_along_axis(row, xl, axis=1)
                g1 = jnp.take_along_axis(row, xl1, axis=1)
                bzacc[eta] = bzacc[eta] + (g0 + wx * (g1 - g0)) * mz
        # stage Y: select/lerp the y axis
        acc = jnp.zeros((by, W), jnp.float32)
        for eta in range(Sy):
            my = jnp.maximum(1. - jnp.abs(ty - float(eta)), 0.)
            acc = acc + bzacc[eta] * my
        out_ref[0, s] = acc


@functools.partial(jax.jit, static_argnames=('Sz', 'Sy', 'bz', 'by'))
def _warp_shift(vol, tz, ty, tx, z0, y0, *, Sz, Sy, bz, by):
    B, D, H, W = vol.shape
    _, Do, Ho, _ = tz.shape
    nbz, nby = Do // bz, Ho // by
    kern = functools.partial(_kernel, Sz=Sz, Sy=Sy, bz=bz, by=by, W=W)
    blk = lambda b, i, j, *_: (b, i, j, 0)                # noqa: E731
    fld = pl.BlockSpec((1, bz, by, W), blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nbz, nby),
        in_specs=[fld, fld, fld, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bz, by, W), blk),
        scratch_shapes=[pltpu.VMEM((Sz, Sy, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Do, Ho, W), jnp.float32),
    )(z0, y0, tz, ty, tx, vol)


def warp_shift(vol, loc, interp_method='linear', pad=4, block=(4, 8)):
    """vol [B,D,H,W] f32, loc [B,D,H,W,3]."""
    B, D, H, W = vol.shape
    bz, by = block
    maxl = jnp.asarray([D - 1., H - 1., W - 1.], jnp.float32)
    cl = jnp.clip(loc.astype(jnp.float32), 0., maxl)
    if interp_method == 'nearest':
        cl = jnp.round(cl)
    lo_i = jnp.clip(jnp.floor(cl), 0., jnp.maximum(maxl - 1., 0.)
                    ).astype(jnp.int32)
    Sz, Sy = min(bz + 2 * pad, D), min(by + 2 * pad, H)
    Do, Ho = D, H
    nbz, nby = Do // bz, Ho // by
    lz = lo_i[..., 0].reshape(B, nbz, bz, nby, by, W)
    ly = lo_i[..., 1].reshape(B, nbz, bz, nby, by, W)
    z0 = jnp.clip(lz.min(axis=(2, 4, 5)), 0, max(D - Sz, 0)).astype(jnp.int32)
    y0 = jnp.clip(ly.min(axis=(2, 4, 5)), 0, max(H - Sy, 0)).astype(jnp.int32)
    return _warp_shift(vol, cl[..., 0], cl[..., 1], cl[..., 2], z0, y0,
                       Sz=Sz, Sy=Sy, bz=bz, by=by)


def fit_chain(fn, x0, n1=2, n2=22):
    def chain(n):
        @jax.jit
        def g(v):
            for _ in range(n):
                v = fn(v)
            return v
        return g
    outs = []
    for g in (chain(n1), chain(n2)):
        r = g(x0)
        _ = np.asarray(r.ravel()[:1])
        t0 = time.time()
        r = g(x0)
        _ = np.asarray(r.ravel()[:1])
        outs.append(time.time() - t0)
    return (outs[1] - outs[0]) / (n2 - n1)


def main():
    wv = 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, wv, wv, wv)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    shift = jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)), jnp.float32)
    loc = (base + shift)[None]
    ref = np.asarray(ne.utils.interpn(vol[0, ..., None], loc[0]))[..., 0]

    blocks = [tuple(int(v) for v in a.split(',')) for a in sys.argv[1:]] \
        or [(4, 8), (8, 8), (2, 8), (8, 16)]
    for bz, by in blocks:
        name = f'shift{bz}x{by}'
        try:
            fn = lambda v: warp_shift(v, loc, pad=4, block=(bz, by))  # noqa
            out = jax.jit(fn)(vol)
            err = np.abs(np.asarray(out)[0] - ref).max()
            t = fit_chain(fn, vol)
            print(f'{name:12s} {1e3 * t:8.3f} ms  '
                  f'{wv ** 3 / t / 1e9:7.3f} Gvox/s  maxerr={err:.2e}',
                  flush=True)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:400]}',
                  flush=True)


if __name__ == '__main__':
    main()
