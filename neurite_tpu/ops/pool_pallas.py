"""
Fused Pallas max-pool (forward + first-max backward) for tiled 2x pooling.

Why: in the 128^3 UNet train step XLA lays full-resolution tensors out with
the LEADING spatial dim on lanes ({1,4,3,2,0:T(8,128)}), and lowers both the
pool forward (`reduce_window` max) and the custom backward's tie-break
reduce (`ops/pool.py` winner min) as lane-axis window reductions that run at
~16x their byte roofline — 1.46 + 1.46 ms at level 0 alone, plus ~2.5 ms of
compare/select mask fusions (round-5 profile, benchmarks/unet_profile.py).
This module computes the same pooling in ONE Pallas pass each way.

Layout trick: the kernel is called on `x.transpose(0, 2, 3, 4, 1)`
([B, H, W, C, D]) whose DEFAULT layout (D minor -> lanes, C -> sublanes) is
byte-identical to the {1,4,3,2,0} layout XLA already chose for the
surrounding convs, so the transposes lower to bitcasts, not copies.

Mosaic constraints shape the kernel bodies: strided slices/gathers only
lower for 2-D arrays, and lane-axis interleaves (jnp.repeat) do not lower
at all — so every reduction/upsample runs on 2-D [rows, D] views, pairing
rows via reshape + static middle-axis indexing and pairing/duplicating
LANES via exact 0/1 selection matmuls on the MXU (one nonzero per output
row: bit-exact for any input, bf16 included).

Semantics match `ops.pool._max_pool_tiled` exactly (gradient to the FIRST
maximal element in (D, H, W) window order — the keras/`select_and_scatter`
tie-break, reference `neurite/tf/models.py:1436-1438`); parity is pinned by
tests/test_ops_kernels.py.
"""

import functools
import os

import jax
import jax.numpy as jnp

_INTERPRET = os.environ.get('NEURITE_PALLAS_POOL', '') == 'interpret'


def _pl():
    from jax.experimental import pallas as pl
    return pl


def supported(x_shape, window, dtype):
    """Pallas path: 3-D volumes, all-2 windows, even spatial dims, and
    sublane-aligned channels for the dtype's native tile."""
    if len(window) != 3 or any(w != 2 for w in window):
        return False
    if len(x_shape) != 5:
        return False
    b, d, h, w, c = x_shape
    if d % 2 or h % 2 or w % 2:
        return False
    # c rides sublanes in the transposed view; 8-multiples suffice for
    # BOTH dtypes (bf16 half-tile c=8 measured exact on v5e, fwd+bwd, at
    # the 160^3 trunk shapes — Mosaic masks the partial (16,128) tile)
    if c % 8:
        return False
    return d >= 8


def _pick_hb(h2, w, c, d, bytes_per_elem, budget=10 * 1024 * 1024):
    """Largest divisor of h2 whose estimated kernel VMEM stack stays under
    `budget`. Mosaic pads the lane axis to 128, so a d<128 block costs
    128/d x its logical bytes (the 32^3/C=64 UNet level OOM'd the in-step
    16MB scoped-vmem limit this way: stack measured ~8.6 B per PADDED
    x-block element for the bwd kernel). bytes_per_elem is the per-kernel
    empirical live-temp cost per padded element."""
    # c rides sublanes: bf16 temps tile (16, 128), so c=8 blocks still
    # occupy 16-sublane tiles — round c up in the estimate (the 160^3
    # c=8 bwd block measured 17.16M at the logical count's hb pick)
    u = 2 * w * max(c, 16) * max(d, 128) * bytes_per_elem
    hb = max(1, min(h2, budget // max(1, u)))
    while h2 % hb:
        hb -= 1
    return hb


def _sel_mats(d, dtype):
    """Even/odd lane-pair selectors Se/So [d, d//2] and the pair-expansion
    E [d//2, d]: one nonzero (1.0) per column/row -> exact value routing."""
    i = jax.lax.broadcasted_iota(jnp.int32, (d, d // 2), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (d, d // 2), 1)
    se = (i == 2 * j).astype(dtype)
    so = (i == 2 * j + 1).astype(dtype)
    return se, so


def _lane_pair(v2, op_max, se, so, prec=None):
    """[R, D] -> [R, D//2] pairwise max/min along lanes via selector
    matmuls (exact: each output element is one input element x 1.0).
    `prec` must be HIGHEST when the values are true f32 — the MXU's
    default bf16 passes round them (measured 4e-3 relative on TPU);
    bf16-representable values (bf16 inputs, small-int tie-break codes)
    are exact at any precision."""
    f = jnp.float32
    a = jax.lax.dot(v2.astype(f), se.astype(f),
                    preferred_element_type=f, precision=prec)
    b = jax.lax.dot(v2.astype(f), so.astype(f),
                    preferred_element_type=f, precision=prec)
    r = jnp.maximum(a, b) if op_max else jnp.minimum(a, b)
    return r.astype(v2.dtype)


def _pool_pairs(x4, op_max, se, so, prec=None):
    """[2hb, W, C, D] -> [hb, W/2, C, D/2] max/min over 2x2x2 windows.

    Mosaic only lowers shape casts that keep the two minor dims intact, so
    every reshape here splits/merges LEADING dims only; pair selection uses
    static middle-axis indexing and the lane pairing a selector matmul.
    """
    hb2, w, c, d = x4.shape
    hb, w2 = hb2 // 2, w // 2
    op = jnp.maximum if op_max else jnp.minimum
    v = x4.reshape(hb, 2, w, c, d)
    v = op(v[:, 0], v[:, 1])                                    # h pairs
    v = v.reshape(hb, w2, 2, c, d)
    v = op(v[:, :, 0], v[:, :, 1])                              # w pairs
    out = _lane_pair(v.reshape(hb * w2 * c, d), op_max, se, so,
                     prec)                                       # d pairs
    return out.reshape(hb, w2, c, d // 2)


def _up(v4, e, prec=None):
    """[hb, W2, C, D2] -> [2hb, W, C, D] nearest upsample (exact routing):
    lanes via the expansion matmul, rows via broadcast into a new middle
    axis (leading-dims-only reshapes — see _pool_pairs)."""
    hb, w2, c, d2 = v4.shape
    f = jnp.float32
    v = jax.lax.dot(v4.reshape(hb * w2 * c, d2).astype(f), e.astype(f),
                    preferred_element_type=f,
                    precision=prec).astype(v4.dtype)
    d = 2 * d2
    v = v.reshape(hb, w2, 1, c, d)
    v = jnp.broadcast_to(v, (hb, w2, 2, c, d)).reshape(hb, w2 * 2, c, d)
    v = v.reshape(hb, 1, w2 * 2, c, d)
    v = jnp.broadcast_to(v, (hb, 2, w2 * 2, c, d))               # h dup
    return v.reshape(2 * hb, 2 * w2, c, d)


def _fwd_kernel(x_ref, y_ref):
    x = x_ref[0]                                   # [2hb, W, C, D]
    prec = ('highest' if jnp.dtype(x_ref.dtype) == jnp.float32 else None)
    se, so = _sel_mats(x.shape[-1], x.dtype)
    y_ref[0] = _pool_pairs(x, True, se, so, prec)


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref):
    # All value comparisons run in f32: Mosaic on v5e rejects bf16 vector
    # `cmpf` ("Target does not support this comparison"), and bf16->f32 is
    # exact so the winner selection is unchanged.
    x = x_ref[0].astype(jnp.float32)               # [2hb, W, C, D]
    y = y_ref[0].astype(jnp.float32)               # [hb, W2, C, D2]
    g = g_ref[0]
    prec = ('highest' if jnp.dtype(x_ref.dtype) == jnp.float32 else None)
    hb2, w, c, d = x.shape
    se, so = _sel_mats(d, x.dtype)
    i = jax.lax.broadcasted_iota(jnp.int32, (d // 2, d), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (d // 2, d), 1)
    e = (j // 2 == i).astype(x.dtype)

    eq = x == _up(y, e, prec)
    # first-max tie break in (D, H, W) window order: idx = pd*4 + ph*2 + pw
    # (matches ops.pool._intra_window_index for window (2,2,2))
    pd = jax.lax.broadcasted_iota(jnp.int32, x.shape, 3) % 2
    ph = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % 2
    pw = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 2
    idx = (pd * 4 + ph * 2 + pw).astype(x.dtype)
    big = jnp.asarray(8, x.dtype)
    cand = jnp.where(eq, idx, big)
    winner = _pool_pairs(cand, False, se, so)      # small ints: any prec
    mask = cand == _up(winner, e)
    gu = _up(g.astype(jnp.float32), e, prec)
    dx_ref[0] = jnp.where(mask, gu, jnp.zeros_like(gu)).astype(dx_ref.dtype)


def _call_fwd(xt):
    pl = _pl()
    b, h, w, c, d = xt.shape
    h2, w2, d2 = h // 2, w // 2, d // 2
    hb = _pick_hb(h2, w, c, d, bytes_per_elem=6)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c, d2), xt.dtype),
        grid=(b, h2 // hb),
        in_specs=[pl.BlockSpec((1, 2 * hb, w, c, d),
                               lambda i, j: (i, j, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, hb, w2, c, d2),
                               lambda i, j: (i, j, 0, 0, 0)),
        interpret=_INTERPRET,
    )(xt)


def _call_bwd(xt, yt, gt):
    pl = _pl()
    b, h, w, c, d = xt.shape
    h2, w2, d2 = h // 2, w // 2, d // 2
    hb = _pick_hb(h2, w, c, d, bytes_per_elem=9)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        grid=(b, h2 // hb),
        in_specs=[
            pl.BlockSpec((1, 2 * hb, w, c, d), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, hb, w2, c, d2), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, hb, w2, c, d2), lambda i, j: (i, j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * hb, w, c, d),
                               lambda i, j: (i, j, 0, 0, 0)),
        interpret=_INTERPRET,
    )(xt, yt, gt)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def max_pool2_3d(x):
    """2x2x2 stride-2 max pool of [B, D, H, W, C] with first-max backward,
    computed by fused Pallas kernels in the D-on-lanes physical layout."""
    xt = jnp.transpose(x, (0, 2, 3, 4, 1))
    yt = _call_fwd(xt)
    return jnp.transpose(yt, (0, 4, 1, 2, 3))


def _fwd(x):
    xt = jnp.transpose(x, (0, 2, 3, 4, 1))
    yt = _call_fwd(xt)
    y = jnp.transpose(yt, (0, 4, 1, 2, 3))
    return y, (xt, yt)


def _bwd(res, g):
    xt, yt = res
    gt = jnp.transpose(g, (0, 2, 3, 4, 1))
    dxt = _call_bwd(xt, yt, gt)
    return (jnp.transpose(dxt, (0, 4, 1, 2, 3)),)


max_pool2_3d.defvjp(_fwd, _bwd)
