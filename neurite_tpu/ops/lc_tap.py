"""
Transposed-layout locally-connected conv (the config-#3 head fast path).

Reference: `neurite/tf/layers.py:811-1532` (LocallyConnected3D). The keras
weight layout is [V, prod(k)*Cin, O] — per output voxel, tap-major /
channel-minor on the MINOR axis. At head scale (447M params, 160^3) every
formulation that keeps that layout is bandwidth-catastrophic on TPU, and
every lane-friendly restructuring of it measured WORSE in the full train
step than the thing it was meant to fix (160^3, C=4, O=1, bf16 params,
`benchmarks/lc_head.py`):

    per-tap loop, keras layout (r2 default)        132.7 ms step
    one-hot-conv patch extraction + lane-reduce    157.5 ms step
    27-slab stacked patches + lane-reduce          181.2 ms step

The root cause is the KERNEL's layout, not the loop structure: per tap,
`kernel[:, t*C:(t+1)*C, :]` is a C-of-TC minor-dim strided slice, so each
of the 27 taps re-reads full 108-lane tiles — ~27x the kernel bytes of a
dense pass; the patch-materializing forms instead pay HBM relayouts of a
[V, TC] tensor nothing else needs.

The fix is to STORE THE KERNEL TRANSPOSED, [O, prod(k)*C, V]: each tap's
weights are dense, full-lane-utilization ROWS read exactly once, and the
matching x taps are strided views of the (padded) channel-major volume
that XLA fuses into the multiply — no patch tensor, no relayout, no
transpose anywhere (the backward's dk is *naturally* produced in this
layout, which a keras-layout parameter would have to pay a second 884MB
transpose for). Plain `jax.grad` lowers the backward well (tap reads
become pad+add folds), so there is no custom VJP to maintain. Measured
standalone at the head shape (fori-loop chains, v5e): fwd 17.1ms vs 48.8
for the keras-layout per-tap form, grad 44.7ms vs 91.6; step numbers in
docs/DESIGN.md "LC head".

Supported: any rank, stride 1, 'same'/'valid', any C/O (callers route
small C*O here; large C*O belongs on the MXU einsum path).
"""

import functools
import itertools
import os

import jax
import jax.numpy as jnp


def _default_layout(x):
    """Pin `x` to the default (row-major, minor-dim-on-lanes) layout.

    The config-#3 residual root cause (r5, `benchmarks/lc_residual.py` +
    HLO dump): XLA's layout assignment gave the 884 MB LC kernel AND its
    adam moments a second, TC-on-lanes layout ({1,2,0}) for the dx tap
    slices below, while the Pallas fwd/dk custom calls constrain the same
    tensor to the default V-on-lanes layout — so every step paid ~8
    whole-tensor relayout copies (~34 ms of the 96 ms profile; the device
    is 99.4% busy — no scheduling gap). Constraining dx's kernel input to
    the default layout removes the preference at its source; no-op where
    the experimental API is unavailable."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint
    except ImportError:
        return x
    try:
        mode = os.environ.get('NEURITE_LC_DX_LAYOUT', 'none')
        if mode == 'constraint':
            return with_layout_constraint(x, Layout(tuple(range(x.ndim))))
        if mode == 'barrier':
            return jax.lax.optimization_barrier(x)
        return x
    except Exception:
        return x


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lc_transposed(x, kernel, kernel_size, padding):
    """
    Locally-connected conv (stride 1) with a transposed weight layout.

    x: [B, *spatial, C]; kernel: [O, prod(k)*C, V] (V = prod(out_spatial),
    tap-major / channel-minor on the MIDDLE axis — the keras feature axis —
    with the voxel axis LAST so every tap row is lane-dense).
    Returns [B, *out_spatial, O] in float32 (callers cast).

    The backward is hand-written (`lc_transposed_dx`/`lc_transposed_dk`):
    XLA's auto-transpose of the broadcast-multiply-reduce form placed the
    C axis on LANES (bf16[B, C, *sp] tiles padded C -> 128, a measured 32x
    HBM expansion that OOMs the isolated grad at 160^3) — the hand forms
    keep V trailing so every tensor stays lane-dense.
    """
    return _lc_transposed_impl(x, kernel, kernel_size, padding)


def _lc_transposed_impl(x, kernel, kernel_size, padding):
    ndims = len(kernel_size)
    C = x.shape[-1]
    O = kernel.shape[0]
    out_sp = _out_shape(x.shape[1:-1], kernel_size, padding)

    xcm = jnp.moveaxis(x, -1, 1)                      # [B, C, *sp]
    if padding == 'same':
        xcm = jnp.pad(xcm, ((0, 0), (0, 0)) + tuple(_pads(kernel_size)))
    k3 = kernel.reshape(O, kernel.shape[1], *out_sp)

    # per-(tap, channel) terms ON PURPOSE — every intermediate is
    # [B, O, *out] with NO channel axis, like the hand-written dx/dk.
    # The single-reduction-per-tap form ([B, O, C, *out] product, sum over
    # C) gave XLA's layout assignment a C axis to put on lanes: measured
    # fwd 17.1 -> 86.3 ms at the 160^3 head, and its grad remats f32
    # copies of the 884 MB kernel (HLO-temp OOM). Trace size is
    # O(prod(k)*C) terms; the routing threshold (filters == 1, C <= 64,
    # layers/local.py) caps it at ~1728 — acceptable, and head-class
    # layers (C <= 16) stay in the proven round-3 envelope.
    y = None
    for t, offs in enumerate(_taps(kernel_size)):
        sl = tuple(slice(offs[d], offs[d] + out_sp[d])
                   for d in range(ndims))
        xt = xcm[(slice(None), slice(None), *sl)]     # [B, C, *out]
        for c in range(C):
            kt = k3[:, t * C + c]                     # [O, *out]
            term = (kt[None].astype(jnp.float32)
                    * xt[:, c][:, None].astype(jnp.float32))
            y = term if y is None else y + term       # [B, O, *out]
    return jnp.moveaxis(y, 1, -1)                     # [B, *out, O]


def lc_transposed_dx(g, kernel, kernel_size, padding, x_shape):
    """
    Input cotangent of `lc_transposed`, V-major by construction.

    g: [B, *out_spatial, O] (any float dtype); kernel: [O, prod(k)*C, V].
    Returns dx [B, *spatial, C] in float32 (callers cast). Every
    intermediate keeps the spatial axes trailing (lane-dense rows), and
    the formulation is READ-only: dx[r] = sum_t m_t[r + p0 - offs_t] with
    m_t = sum_o k_t * g, realized as pad-once + static-slice adds that XLA
    fuses into one accumulation. (The scatter form — `.at[offs].add` per
    tap — lowered to serial dynamic-update-slice copies and blew the
    config-#3 step 96 -> 646 ms; same pathology as the patch extraction in
    docs/DESIGN.md "LC head".)
    """
    ndims = len(kernel_size)
    C = x_shape[-1]
    O = kernel.shape[0]
    sp = list(x_shape[1:-1])
    out_sp = _out_shape(sp, kernel_size, padding)
    gcm = jnp.moveaxis(g, -1, 1).astype(jnp.float32)  # [B, O, *out]
    kernel = _default_layout(kernel)
    k3 = kernel.reshape(O, kernel.shape[1], *out_sp)
    pads = _pads(kernel_size) if padding == 'same' else [(0, 0)] * ndims
    B = g.shape[0]
    # mp index = (r + p0 - offs) + (k-1-p0) = r + (k-1) - offs
    padcfg = ([(0, 0)]
              + [(k - 1 - p0, s + p0 - o)
                 for k, (p0, _), s, o in zip(kernel_size, pads, sp, out_sp)])
    # NOTE per-(tap, channel) loops on purpose: every intermediate is
    # [B, *spatial] with NO channel axis — vectorizing C as a middle dim
    # ([O, C, *out] tap slices) let XLA's layout assignment put C on lanes
    # (bf16 tiles padded ~32x, a measured 52 GB HLO-temp OOM at 160^3).
    # NEURITE_LC_DX_FORM='mstack' replaces the 108 MIDDLE-axis kernel
    # slices (`k3[:, i]`) with one broadcast multiply + LEADING-axis
    # slices — a probe for the config-#3 relayout tax (the middle-axis
    # slicing is the suspected source of XLA's second kernel layout;
    # docs/DESIGN.md "Config-#3 residual root-caused").
    form = os.environ.get('NEURITE_LC_DX_FORM', 'percslice')
    if form == 'mstack':
        dxs = []
        for b in range(B):
            # m_all[tc, r'] = sum_o k3[o, tc, r'] g[b, o, r']
            m_all = jnp.sum(k3.astype(jnp.float32)
                            * gcm[b][:, None], axis=0)       # [TC, *out]
            mp = jnp.pad(m_all, ([(0, 0)] + padcfg[1:]))
            accs = []
            for c in range(C):
                acc = None
                for t, offs in enumerate(_taps(kernel_size)):
                    sl = tuple(slice(kernel_size[d] - 1 - offs[d],
                                     kernel_size[d] - 1 - offs[d] + sp[d])
                               for d in range(ndims))
                    piece = mp[(t * C + c, *sl)]             # [*sp]
                    acc = piece if acc is None else acc + piece
                accs.append(acc)
            dxs.append(jnp.stack(accs, -1))                  # [*sp, C]
        return jnp.stack(dxs, 0)                             # [B, *sp, C]
    dxs = []
    for c in range(C):
        acc = jnp.zeros((B, *sp), jnp.float32)
        for t, offs in enumerate(_taps(kernel_size)):
            kc = k3[:, t * C + c].astype(jnp.float32)       # [O, *out]
            m = jnp.sum(kc[None] * gcm, axis=1)             # [B, *out]
            mp = jnp.pad(m, padcfg)
            sl = tuple(slice(kernel_size[d] - 1 - offs[d],
                             kernel_size[d] - 1 - offs[d] + sp[d])
                       for d in range(ndims))
            acc = acc + mp[(slice(None), *sl)]
        dxs.append(acc)
    return jnp.stack(dxs, -1)                         # [B, *sp, C]


def lc_transposed_dk(g, x, kernel_size, padding):
    """
    Kernel cotangent of `lc_transposed`, produced NATIVELY in the
    transposed layout [O, prod(k)*C, V] (V-major rows, no relayout).
    Returns float32 (callers cast). Per-(tap, channel) loops keep every
    intermediate free of a channel axis (see `lc_transposed_dx`).
    """
    ndims = len(kernel_size)
    C = x.shape[-1]
    out_sp = _out_shape(x.shape[1:-1], kernel_size, padding)
    gcm = jnp.moveaxis(g, -1, 1).astype(jnp.float32)  # [B, O, *out]
    if padding == 'same':
        xpads = ((0, 0),) + tuple(_pads(kernel_size)) + ((0, 0),)
        xp = jnp.pad(x, xpads)
    else:
        xp = x
    rows = []
    for t, offs in enumerate(_taps(kernel_size)):
        sl = tuple(slice(offs[d], offs[d] + out_sp[d]) for d in range(ndims))
        for c in range(C):
            xt = xp[(slice(None), *sl, c)].astype(jnp.float32)  # [B, *out]
            # dk_t[o, v] = sum_b g[b, o, v] * xt[b, v]
            rows.append(jnp.sum(gcm * xt[:, None], axis=0))     # [O, *out]
    dk = jnp.stack(rows, axis=1)                      # [O, prod(k)*C, *out]
    return dk.reshape(dk.shape[0], dk.shape[1], -1)


def _lc_transposed_fwd(x, kernel, kernel_size, padding):
    return _lc_transposed_impl(x, kernel, kernel_size, padding), (x, kernel)


def _lc_transposed_bwd(kernel_size, padding, res, g):
    x, kernel = res
    dx = lc_transposed_dx(g, kernel, kernel_size, padding,
                          x.shape).astype(x.dtype)
    dk = lc_transposed_dk(g, x, kernel_size, padding).astype(kernel.dtype)
    return dx, dk


lc_transposed.defvjp(_lc_transposed_fwd, _lc_transposed_bwd)


def keras_to_transposed(kernel):
    """[V, TC, O] keras layout -> [O, TC, V] (checkpoint migration helper)."""
    return jnp.transpose(kernel, (2, 1, 0))


def transposed_to_keras(kernel):
    """[O, TC, V] -> [V, TC, O] keras layout."""
    return jnp.transpose(kernel, (2, 1, 0))
