"""
Pallas locally-connected (unshared-weight) conv — the flagship native
kernel (reference `neurite/tf/layers.py:811-1532`).

Why: XLA lowers the per-voxel contraction `einsum('bvi,vio->bvo')` into a
while loop that MATERIALIZES the [V, k^3*C] patch tensor in f32 via serial
dynamic-update-slices (~120ms of a 171ms train step for the 447M-param
160^3 head), and the per-tap XLA form still pays a lane-realignment fusion
per tap (132.7ms step). This kernel reads everything ~once:

- the volume is treated as FLAT rows of V voxels x C channels; a block is
  BLK consecutive voxels;
- per block, the kernel slab [BLK, K] rides one DMA (native [V, K, 1]
  parameter layout — no transposes anywhere), and each of the k^3 taps'
  shifted x-runs [BLK, C] is DMA'd straight into its column slice of a
  [BLK, K] patch scratch (flat-index shift off = dz*H*W + dy*W + dx);
- SAME-conv zero edges are restored by an iota mask (a flat shift wraps
  rows at y/x volume edges — exactly the positions SAME padding zeroes);
- the contraction is one elementwise multiply + lane reduction (VPU);
  accumulation f32.

Supported fast path: 3-D, stride 1, padding 'same', filters O=1, B=1
(callers vmap or fall back), V % 8 == 0. Everything else uses the XLA
forms in `layers/local.py`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048


def _pick_blk(V):
    """Largest divisor of V that is <= BLK and a multiple of 8 (sublanes)."""
    for blk in (BLK, 1024, 512, 256, 128, 64, 32, 16, 8):
        if blk <= V and V % blk == 0:
            return blk
    return V


def _offsets(kernel_size, H, W):
    """Flat-index shift and (dz, dy, dx) deltas per tap (centered)."""
    kz, ky, kx = kernel_size
    offs = []
    for tz in range(kz):
        for ty in range(ky):
            for tx in range(kx):
                dz, dy, dx = tz - kz // 2, ty - ky // 2, tx - kx // 2
                offs.append((dz * H * W + dy * W + dx, dz, dy, dx))
    return offs


def supported(x_shape, kernel_size, filters, strides, padding):
    """True when (B, D, H, W, C) x can take the Pallas fast path."""
    if len(x_shape) != 5 or filters != 1:
        return False
    if padding != 'same' or any(s != 1 for s in strides):
        return False
    if len(kernel_size) != 3 or any(k % 2 == 0 for k in kernel_size):
        return False
    b, d, h, w, c = x_shape
    if (d * h * w) % 8 or c > 16:
        return False
    return True


def _mask_block(v0, D, H, W, C, offs, dtype, blk):
    """
    [blk, len(offs)*C] validity mask for a block starting at flat voxel v0.

    Entry (r, t*C + c) is 1 iff voxel v = v0 + r shifted by tap t stays
    inside the volume on every axis (flat shifts wrap at y/x edges — the
    positions SAME padding zeroes).
    """
    v = v0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    w = v % W
    y = (v // W) % H
    z = v // (W * H)
    cols = []
    for _, dz, dy, dx in offs:
        ok = ((z + dz >= 0) & (z + dz < D)
              & (y + dy >= 0) & (y + dy < H)
              & (w + dx >= 0) & (w + dx < W))
        cols.append(jnp.broadcast_to(ok, (blk, C)))
    return jnp.concatenate(cols, axis=1).astype(dtype)


def _fwd_kernel(xf_hbm, k_ref, o_ref, patch, sem, *, offs, D, H, W, C, pad, blk):
    """One block: DMA 27 shifted x-runs into patch columns, contract."""
    i = pl.program_id(0)
    v0 = i * blk

    # start all tap DMAs (xf_hbm is the flat [pad + V + pad, C] volume;
    # +pad keeps every shifted run in bounds)
    dmas = []
    for t, (off, _, _, _) in enumerate(offs):
        dma = pltpu.make_async_copy(
            xf_hbm.at[pl.ds(v0 + off + pad, blk), :],
            patch.at[:, pl.ds(t * C, C)],
            sem.at[t])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    mask = _mask_block(v0, D, H, W, C, offs, jnp.float32, blk)
    p = patch[:, :].astype(jnp.float32) * mask
    k = k_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = jnp.sum(p * k, axis=1, keepdims=True)


def _dk_kernel(xf_hbm, g_ref, dk_ref, patch, sem, *, offs, D, H, W, C, pad, blk):
    """dk[v, t*C+c] = mask * x[v + off_t, c] * g[v]."""
    i = pl.program_id(0)
    v0 = i * blk
    dmas = []
    for t, (off, _, _, _) in enumerate(offs):
        dma = pltpu.make_async_copy(
            xf_hbm.at[pl.ds(v0 + off + pad, blk), :],
            patch.at[:, pl.ds(t * C, C)],
            sem.at[t])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    mask = _mask_block(v0, D, H, W, C, offs, jnp.float32, blk)
    p = patch[:, :].astype(jnp.float32) * mask
    dk_ref[:, :] = (p * g_ref[:, :].astype(jnp.float32)).astype(
        dk_ref.dtype)


def _dx_kernel(q_hbm, dx_ref, run, sem, *, offs, D, H, W, C, pad, blk):
    """
    dx[u, c] = sum_t valid_t(u - off_t is a voxel that read u) *
               q[u - off_t, t*C + c],  q[v, t*C+c] = g[v] * k[v, t*C+c].

    Output-side validity: output voxel v = u - off_t read input u iff the
    tap was in-bounds FOR v, i.e. v + off stays inside — which by
    construction equals u being reachable: mask on (u, reversed tap).
    """
    i = pl.program_id(0)
    v0 = i * blk
    acc = jnp.zeros((blk, C), jnp.float32)
    # reversed-tap mask: u - off_t in volume AND its per-axis deltas legal
    u = v0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    w = u % W
    y = (u // W) % H
    z = u // (W * H)
    dmas = []
    for t, (off, _, _, _) in enumerate(offs):
        dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(v0 - off + pad, blk), pl.ds(t * C, C)],
            run.at[:, pl.ds(t * C, C)],
            sem.at[t])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    for t, (off, dz, dy, dx) in enumerate(offs):
        ok = ((z - dz >= 0) & (z - dz < D)
              & (y - dy >= 0) & (y - dy < H)
              & (w - dx >= 0) & (w - dx < W))
        m = jnp.broadcast_to(ok, (blk, C)).astype(jnp.float32)
        acc = acc + run[:, t * C:(t + 1) * C].astype(jnp.float32) * m
    dx_ref[:, :] = acc


def _pad_flat(xf, pad):
    return jnp.pad(xf, ((pad, pad), (0, 0)))


def _run_fwd(xf, kernel2, shape3, kernel_size, interpret=False):
    D, H, W = shape3
    C = xf.shape[-1]
    V = D * H * W
    offs = _offsets(kernel_size, H, W)
    K = len(offs) * C
    pad = (kernel_size[0] // 2) * H * W + (kernel_size[1] // 2) * W \
        + kernel_size[2] // 2
    xp = _pad_flat(xf, pad)
    blk = _pick_blk(V)
    grid = (V // blk,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, offs=offs, D=D, H=H, W=W, C=C,
                          pad=pad, blk=blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((blk, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, K), xf.dtype),
            pltpu.SemaphoreType.DMA((len(offs),)),
        ],
        interpret=interpret,
    )(xp, kernel2)
    return out


def _run_dk(xf, g, shape3, kernel_size, kdtype, interpret=False):
    D, H, W = shape3
    C = xf.shape[-1]
    V = D * H * W
    offs = _offsets(kernel_size, H, W)
    K = len(offs) * C
    pad = (kernel_size[0] // 2) * H * W + (kernel_size[1] // 2) * W \
        + kernel_size[2] // 2
    xp = _pad_flat(xf, pad)
    blk = _pick_blk(V)
    grid = (V // blk,)
    dk = pl.pallas_call(
        functools.partial(_dk_kernel, offs=offs, D=D, H=H, W=W, C=C,
                          pad=pad, blk=blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((blk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, K), kdtype),
        scratch_shapes=[
            pltpu.VMEM((blk, K), xf.dtype),
            pltpu.SemaphoreType.DMA((len(offs),)),
        ],
        interpret=interpret,
    )(xp, g)
    return dk


def _run_dx(q, shape3, kernel_size, xdtype, interpret=False):
    D, H, W = shape3
    V = D * H * W
    K = q.shape[-1]
    offs = _offsets(kernel_size, H, W)
    C = K // len(offs)
    pad = (kernel_size[0] // 2) * H * W + (kernel_size[1] // 2) * W \
        + kernel_size[2] // 2
    qp = jnp.pad(q, ((pad, pad), (0, 0)))
    blk = _pick_blk(V)
    grid = (V // blk,)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, offs=offs, D=D, H=H, W=W, C=C,
                          pad=pad, blk=blk),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, K), q.dtype),
            pltpu.SemaphoreType.DMA((len(offs),)),
        ],
        interpret=interpret,
    )(qp)
    return dx.astype(xdtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lc3d_pallas(xf, kernel2, shape3, kernel_size, interpret=False):
    """
    Flat locally-connected 3-D conv, stride 1, SAME, O=1.

    xf: [V, C] (flattened [D, H, W, C]); kernel2: [V, K] (K = k^3*C,
    tap-major / channel-minor — the keras LC layout). Returns [V, 1] f32.
    """
    return _run_fwd(xf, kernel2, shape3, kernel_size, interpret)


def _lc3d_fwd(xf, kernel2, shape3, kernel_size, interpret):
    y = _run_fwd(xf, kernel2, shape3, kernel_size, interpret)
    return y, (xf, kernel2)


def _lc3d_bwd(shape3, kernel_size, interpret, res, g):
    xf, kernel2 = res
    g = g.astype(jnp.float32)
    dk = _run_dk(xf, g, shape3, kernel_size, kernel2.dtype, interpret)
    # q rides HBM at the kernel's dtype (halves dx-pass traffic for bf16
    # params); products form in f32 and the dx kernel accumulates in f32 —
    # the same precision contract as the forward
    q = (g * kernel2.astype(jnp.float32)).astype(kernel2.dtype)
    dx = _run_dx(q, shape3, kernel_size, xf.dtype, interpret)
    return dx, dk


lc3d_pallas.defvjp(_lc3d_fwd, _lc3d_bwd)
