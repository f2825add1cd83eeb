"""
Lane-friendly locally-connected conv with a custom VJP (the config-#3 head).

Reference: `neurite/tf/layers.py:811-1532` (LocallyConnected3D). The keras
weight layout is [V, prod(k)*Cin, O] — per output voxel, tap-major /
channel-minor on the MINOR axis. XLA's own lowerings of this contraction are
catastrophic at head scale (447M params, 160^3): `einsum('bvi,vio->bvo')`
becomes a serial while-loop that materializes the patch tensor through
dynamic-update-slices, and the per-tap elementwise form runs [V, C]-shaped
ops at C/128 lane utilization (fwd+bwd measured 92.7ms where one pass over
the weights is ~1.1ms at bandwidth).

The fix is to keep every big operand on a >=108-lane minor axis and express
the three passes as fused elementwise/reduce pipelines XLA lowers well:

- forward: materialize patches P[B, V, T*C] ONCE (a 27-way concatenate of
  shifted views — a single output pass, no DUS) and lane-reduce
  `sum(P * K, axis=-1)`. No transposes.
- dk = P * g broadcast over lanes: directly in the keras layout. No
  transposes.
- dx: q = g * K (lane layout), ONE transpose to [T*C, B, *out], then 27
  shifted `jnp.pad`+add folds of [C, B, *out] planes (never
  dynamic-update-slice).

The VJP saves P as its residual (HBM for bandwidth: one patch write in the
forward replaces a 27-slice regeneration in the backward). Supported: any
rank, stride 1, 'same'/'valid', any C/O. Measured (160^3, C=4, O=1, bf16
x/params): fwd 3.0ms, fwd+bwd 18.3ms vs 7.25/92.7ms for the XLA per-tap
form — step time in docs/DESIGN.md.
"""

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np


def _pads(kernel_size):
    out = []
    for k in kernel_size:
        total = k - 1
        out.append((total // 2, total - total // 2))
    return out


def _out_shape(spatial, kernel_size, padding):
    if padding == 'same':
        return list(spatial)
    return [s - k + 1 for s, k in zip(spatial, kernel_size)]


def _taps(kernel_size):
    return list(itertools.product(*[range(k) for k in kernel_size]))


def _patches(x, kernel_size, padding):
    """[B, *sp, C] -> [B, V, T*C] (tap-major / channel-minor lanes)."""
    ndims = len(kernel_size)
    if padding == 'same':
        x = jnp.pad(x, [(0, 0)] + _pads(kernel_size) + [(0, 0)])
    out_sp = [x.shape[1 + d] - kernel_size[d] + 1 for d in range(ndims)]
    slabs = []
    for offs in _taps(kernel_size):
        sl = tuple(slice(offs[d], offs[d] + out_sp[d]) for d in range(ndims))
        slabs.append(x[(slice(None), *sl, slice(None))])
    P = jnp.stack(slabs, axis=-2)                      # [B, *out, T, C]
    return P.reshape(x.shape[0], int(np.prod(out_sp)), -1), out_sp


def _contract(P, kernel):
    """[B, V, TC] x [V, TC, O] -> [B, V, O] f32 by lane-reduce per o."""
    outs = [jnp.sum(P.astype(jnp.float32) * kernel[None, :, :, o],
                    axis=-1) for o in range(kernel.shape[-1])]
    return jnp.stack(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lc_tapsum(x, kernel, kernel_size, padding):
    """
    Locally-connected conv (stride 1), lane-friendly layouts throughout.

    x: [B, *spatial, C]; kernel: [V, prod(k)*C, O] keras-layout.
    Returns [B, *out_spatial, O] in float32 (callers cast).
    """
    P, out_sp = _patches(x, kernel_size, padding)
    y = _contract(P, kernel.astype(jnp.float32))
    return y.reshape(x.shape[0], *out_sp, kernel.shape[-1])


def _lc_fwd(x, kernel, kernel_size, padding):
    P, out_sp = _patches(x, kernel_size, padding)
    kf = kernel.astype(jnp.float32)
    y = _contract(P, kf)
    y = y.reshape(x.shape[0], *out_sp, kernel.shape[-1])
    # zero-size carrier arrays smuggle the static out/x shapes + x dtype
    # through the residual pytree (plain tuples are not valid JAX leaves)
    meta = jnp.zeros((0,) + tuple(out_sp), x.dtype)
    xmeta = jnp.zeros((0,) + x.shape[1:], x.dtype)
    return y, (P, kernel, meta, xmeta)


def _lc_bwd(kernel_size, padding, res, g):
    P, kernel, meta, xmeta = res
    out_sp = meta.shape[1:]
    x_dtype = meta.dtype
    x_shape = (P.shape[0],) + xmeta.shape[1:]
    ndims = len(kernel_size)
    B, C = x_shape[0], x_shape[-1]
    T = int(np.prod(kernel_size))
    O = kernel.shape[-1]
    V = int(np.prod(out_sp))
    g2 = g.reshape(B, V, O).astype(jnp.float32)

    # dk[v, i, o] = sum_b P[b, v, i] * g[b, v, o] — keras layout, fused
    Pf = P.astype(jnp.float32)
    dk = jnp.stack([jnp.sum(Pf * g2[:, :, None, o], axis=0)
                    for o in range(O)], axis=-1).astype(kernel.dtype)

    # dx: q[b, v, i] = sum_o kernel[v, i, o] * g[b, v, o]  (lane layout),
    # then ONE transpose to [T*C, B, *out] and 27 shifted pad+add folds
    kf = kernel.astype(jnp.float32)
    q = sum(kf[None, :, :, o] * g2[:, :, None, o] for o in range(O))
    qT = jnp.moveaxis(q, -1, 0).reshape(T, C, B, *out_sp)

    if padding == 'same':
        sp_p = [out_sp[d] + kernel_size[d] - 1 for d in range(ndims)]
    else:
        sp_p = [x_shape[1 + d] for d in range(ndims)]
    dxc = None
    for t, offs in enumerate(_taps(kernel_size)):
        cfg = [(0, 0), (0, 0)] + [
            (offs[d], sp_p[d] - out_sp[d] - offs[d]) for d in range(ndims)]
        term = jnp.pad(qT[t], cfg)                     # [C, B, *sp_p]
        dxc = term if dxc is None else dxc + term
    if padding == 'same':
        sl = tuple(slice(p[0], s - p[1])
                   for p, s in zip(_pads(kernel_size), sp_p))
        dxc = dxc[(slice(None), slice(None), *sl)]
    dx = jnp.moveaxis(dxc, 0, -1).astype(x_dtype)      # [B, *sp, C]
    return dx, dk


lc_tapsum.defvjp(_lc_fwd, _lc_bwd)
