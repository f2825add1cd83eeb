"""
Fused one-pass separable 3-D blur (Pallas TPU kernel).

The reference applies 1-D kernels axis-by-axis through `tf.nn.convolution`
(`neurite/tf/utils/utils.py:665-751`), which on TPU means one full
HBM round trip of the volume per axis (our XLA path already reformulates the
passes as reshape-only (k,1) 2-D convs — docs/DESIGN.md). This kernel fuses
all three axis passes into ONE pass over the volume: a z-slab (with kernel-
radius halo rows) is DMA'd into VMEM once, the x and y passes run as masked
lane/sublane roll-and-accumulate on the VPU, the z pass combines slab rows,
and each volume element is read from and written to HBM exactly once.

Semantics match `utils.separable_conv` with padding='SAME', stride 1, no
dilation (cross-correlation, zero padding, odd kernel widths) — the form
every Gaussian-blur path in the framework uses. Parity-tested against the
XLA path; gradients via custom_vjp (input grad = same kernel with flipped
taps; tap grads via jnp shifts, DCE'd when unused).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for slab + accumulators (bytes); beyond this fall back to XLA
_VMEM_BUDGET = 10 * 1024 * 1024


def _round8(n):
    return -(-n // 8) * 8


def _pick_bz(d, rz):
    # slab sublane count must be 8-aligned for Mosaic rolls
    for bz in (8, 16, 4, 2, 1):
        if d % bz == 0 and d >= _round8(bz + 2 * rz):
            return bz
    return None


def _blur_kernel(kz_ref, ky_ref, kx_ref, x_hbm, o_ref, slab, sem, *,
                 D, H, W, Sz, bz, rz, ry, rx, Kz, Ky, Kx):
    zb = pl.program_id(1)
    z0 = zb * bz
    s0 = jnp.clip(z0 - rz, 0, D - Sz)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(s0, Sz)], slab, sem)
    dma.start()
    dma.wait()

    # layout (Sz*H, W): x rolls stay within one 128-lane vreg; y and z
    # become sublane rolls with row masks (lane-merging reshapes and
    # multi-vreg lane rolls are unsupported/unreliable in Mosaic)
    a = slab[:].reshape(Sz * H, W)
    xpos = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    ypos = jax.lax.broadcasted_iota(jnp.int32, (Sz * H, 1), 0) % H

    # tap loops as fori_loops (dynamic roll shifts) so only ONE shifted copy
    # is live at a time — unrolled tap chains blow the scoped-VMEM stack
    def axis_pass(a, k_ref, K, r, pos, limit, axis, stride):
        def body(t, acc):
            s = t - r
            src = pos + s
            mask = ((src >= 0) & (src < limit)).astype(a.dtype)
            rolled = pltpu.roll(a, (-s * stride) % a.shape[axis], axis=axis)
            return acc + k_ref[0, t] * mask * rolled
        if K == 1:
            return k_ref[0, 0] * a
        return jax.lax.fori_loop(0, K, body, jnp.zeros_like(a))

    a = axis_pass(a, kx_ref, Kx, rx, xpos, W, 1, 1)
    a = axis_pass(a, ky_ref, Ky, ry, ypos, H, 0, 1)

    # align rows so row i holds absolute z = z0 - rz + i//H, zeroing rows
    # outside the volume — then every z tap is a rotation with the same base
    d_shift = (z0 - rz) - s0
    a = pltpu.roll(a, (-d_shift * H) % (Sz * H), axis=0)
    zabs = (jax.lax.broadcasted_iota(jnp.int32, (Sz * H, 1), 0) // H
            + (z0 - rz))
    a = a * ((zabs >= 0) & (zabs < D)).astype(a.dtype)

    def z_body(t, out):
        return out + kz_ref[0, t] * pltpu.roll(a, (-t * H) % (Sz * H),
                                               axis=0)[0:bz * H]
    if Kz == 1:
        out = kz_ref[0, 0] * a[0:bz * H]
    else:
        out = jax.lax.fori_loop(0, Kz, z_body,
                                jnp.zeros((bz * H, W), a.dtype))
    o_ref[0] = out.reshape(bz, H, W)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _blur3d_p(x, kz, ky, kx, interpret=False):
    N, D, H, W = x.shape
    # pad lanes to a 128 multiple (zero pad preserves SAME-conv semantics
    # exactly: out-of-range taps contribute k*0); Mosaic lane rolls need it
    Wp = -(-W // 128) * 128
    if Wp != W:
        out = _blur3d_p(jnp.pad(x, [(0, 0)] * 3 + [(0, Wp - W)]),
                        kz, ky, kx, interpret=interpret)
        return out[..., :W]
    Kz, Ky, Kx = (int(k.shape[-1]) for k in (kz, ky, kx))
    rz, ry, rx = Kz // 2, Ky // 2, Kx // 2
    bz = _pick_bz(D, rz)
    assert bz is not None, 'caller must pre-check _supported'
    Sz = _round8(bz + 2 * rz)

    kern = functools.partial(
        _blur_kernel, D=D, H=H, W=W, Sz=Sz, bz=bz, rz=rz, ry=ry, rx=rx,
        Kz=Kz, Ky=Ky, Kx=Kx)
    nvox = N * D * H * W
    out = pl.pallas_call(
        kern,
        grid=(N, D // bz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kz
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ky
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kx
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, bz, H, W), lambda n, zb: (n, zb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D, H, W), x.dtype),
        scratch_shapes=[pltpu.VMEM((Sz, H, W), x.dtype),
                        pltpu.SemaphoreType.DMA],
        # honest cost: without this XLA schedules the custom call blind
        # (kernel_metadata={} in the HLO) in large programs
        cost_estimate=pl.CostEstimate(
            flops=2 * nvox * (Kz + Ky + Kx),
            bytes_accessed=2 * nvox * x.dtype.itemsize
            + nvox * x.dtype.itemsize * 2 * rz // max(bz, 1),
            transcendentals=0),
        interpret=interpret,
    )(kz.reshape(1, -1), ky.reshape(1, -1), kx.reshape(1, -1), x)
    # keep the 8MB+ output out of long-lived scoped-VMEM pinning: embedded
    # in the 128^3 synthesis program, XLA's memory-space assignment placed
    # the output in S(1) across a ~250-instruction live range, starving the
    # rest of the schedule (the round-1 "204->375ms" in-context regression;
    # benchmarks/blur_context.py). The barrier severs the value for MSA.
    if os.environ.get('NEURITE_BLUR_OUT_BARRIER', '1') != '0':
        out = jax.lax.optimization_barrier(out)
    return out


def _blur3d_jnp(x, kz, ky, kx):
    """XLA oracle: same math as utils.separable_conv's per-axis passes."""
    N, D, H, W = x.shape
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ('NHWC', 'HWIO', 'NHWC'))
    for ax, k in ((1, kz), (2, ky), (3, kx)):
        width = int(k.shape[-1])
        if width == 1:
            x = x * k[0]
            continue
        space = x.shape
        pre = int(np.prod(space[:ax]))
        post = int(np.prod(space[ax + 1:]))
        xr = x.reshape(pre, space[ax], post, 1)
        out = jax.lax.conv_general_dilated(
            xr, k.reshape(width, 1, 1, 1), window_strides=(1, 1),
            padding='SAME', dimension_numbers=dn)
        x = out.reshape(space)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _blur3d_ad(x, kz, ky, kx, interpret):
    return _blur3d_p(x, kz, ky, kx, interpret=interpret)


def _blur3d_fwd(x, kz, ky, kx, interpret):
    return _blur3d_p(x, kz, ky, kx, interpret=interpret), (x, kz, ky, kx)


def _blur3d_bwd(interpret, res, g):
    x, kz, ky, kx = res
    # input grad: adjoint of zero-padded correlation = correlation with
    # flipped taps — the same fused kernel
    dx = _blur3d_p(g, kz[::-1], ky[::-1], kx[::-1], interpret=interpret)

    # tap grads (rarely used — XLA DCEs them when the cotangents are unused):
    # dk_a[t] = sum g * (blur along the other two axes of x, shifted by t-r)
    def tap_grads(axis, k, other):
        r = int(k.shape[-1]) // 2
        u = _blur3d_jnp(x, *other)
        dims = x.shape
        grads = []
        for t in range(int(k.shape[-1])):
            s = t - r
            lo = max(s, 0)
            hi = min(dims[axis] + s, dims[axis])
            src = jax.lax.slice_in_dim(u, lo, hi, axis=axis)
            pad = [(0, 0)] * 4
            pad[axis] = (max(-s, 0), dims[axis] - (hi - lo) - max(-s, 0))
            src = jnp.pad(src, pad)
            grads.append(jnp.sum(g * src))
        return jnp.stack(grads)

    one = jnp.ones((1,), x.dtype)
    dkz = tap_grads(1, kz, (one, ky, kx))
    dky = tap_grads(2, ky, (kz, one, kx))
    dkx = tap_grads(3, kx, (kz, ky, one))
    return dx, dkz, dky, dkx


_blur3d_ad.defvjp(_blur3d_fwd, _blur3d_bwd)


def profitable(shape):
    """
    Whether the fused kernel beats the XLA per-axis passes at this size.
    Measured on v5e (benchmarks/blur.py): 4.2x at 128^3 k=7, 2.0x at k=13;
    below ~2M voxels or with <128 lanes the grid is too small to amortize
    kernel launch + DMA setup and XLA wins (0.6x at 64^3 k=7).
    """
    N, D, H, W = shape
    return W >= 128 and N * D * H * W >= 1 << 21


def supported(shape, kernel_widths, dtype):
    """Whether the fused kernel handles this (N, D, H, W) blur."""
    if len(shape) != 4 or dtype not in (jnp.float32, np.float32):
        return False
    N, D, H, W = shape
    widths = [int(w) for w in kernel_widths]
    if any(w % 2 == 0 for w in widths):
        return False
    if H % 8 != 0:
        return False              # sublane rolls need 8-aligned rows
    if sum(widths) > 48:
        return False              # VPU taps lose to MXU convs at ~60+ taps
    rz = widths[0] // 2
    bz = _pick_bz(D, rz)
    if bz is None:
        return False
    Sz = _round8(bz + 2 * rz)
    Wp = -(-W // 128) * 128
    return 3 * Sz * H * Wp * 4 <= _VMEM_BUDGET


def separable_blur3d(x, kernels, impl='auto', interpret=False):
    """
    Fused separable SAME blur of x: [N, D, H, W] with 1-D taps per axis.

    kernels: sequence of 3 1-D arrays (odd widths; length-1 = identity).
    impl: 'auto' (pallas on TPU when supported, else XLA), 'pallas', 'jnp'.
    """
    x = jnp.asarray(x)
    kz, ky, kx = [jnp.asarray(k, x.dtype).reshape(-1) for k in kernels]
    if impl == 'auto':
        from neurite_tpu import backend
        ok = (supported(x.shape, [k.shape[-1] for k in (kz, ky, kx)],
                        x.dtype) and profitable(x.shape))
        impl = 'pallas' if (ok and (interpret or backend.is_tpu())) \
            else 'jnp'
    if impl == 'pallas':
        return _blur3d_ad(x, kz, ky, kx, interpret)
    return _blur3d_jnp(x, kz, ky, kx)
