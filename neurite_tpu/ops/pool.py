"""
Max pooling with a TPU-fast custom backward.

XLA differentiates `reduce_window` max pooling into `select_and_scatter`,
which on TPU lowers into a narrow T(2,128) layout and drags three
full-volume relayout copies with it — measured 14ms of a 54ms UNet-128^3
train step (26%), the single largest cost cluster in the whole program
(docs/DESIGN.md "Training step"). This module keeps the identical
`reduce_window` forward but swaps the backward for a first-max mask
formulation (elementwise compares + one reduce-min), which stays in the
native layout and fuses.

Semantics match the reference's TF/Keras MaxPooling gradient
(`neurite/tf/models.py:1436-1438` uses keras MaxPoolingND): the gradient
routes to the FIRST maximal element of each window (tie-break by window
order), exactly like XLA's select_and_scatter lowering.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _use_pallas(shape, window, dtype):
    """Route 2x2x2 3-D pools through the fused Pallas kernels on TPU
    (ops/pool_pallas.py): reduce_window along the lane axis runs at ~16x
    its byte roofline in the UNet step (round-5 profile; in-step win
    29.5 -> 26.7 ms at 128^3). Default-on SINGLE-CHIP only — GSPMD cannot
    partition the custom call, so multi-device programs keep the XLA path
    (same policy as the LC layer's Pallas gate, layers/local.py).
    NEURITE_PALLAS_POOL overrides: '0' forces XLA, '1'/'interpret' force
    the kernel (e.g. inside shard_map where each program is per-device)."""
    flag = os.environ.get('NEURITE_PALLAS_POOL', '')
    if flag == '0':
        return False
    from neurite_tpu.backend import is_tpu
    if flag in ('1', 'interpret'):
        pass
    elif not (is_tpu() and len(jax.devices()) == 1):
        return False
    from neurite_tpu.ops.pool_pallas import supported
    return supported(shape, window, dtype)


def _window_reduce(x, window, init, op):
    """reduce_window over non-overlapping `window` (== strides), VALID."""
    nd = x.ndim
    dims = (1,) + tuple(window) + (1,)
    return lax.reduce_window(x, init, op, dims, dims, 'VALID')


def _upsample(y, window):
    """Nearest-neighbor broadcast of pooled values back to input shape."""
    for ax, w in enumerate(window):
        if w != 1:
            y = jnp.repeat(y, int(w), axis=ax + 1)
    return y


def _intra_window_index(shape, window, dtype):
    """Linear index of each element within its pooling window (static)."""
    idx = None
    for ax, w in enumerate(window):
        ia = lax.broadcasted_iota(jnp.int32, shape, ax + 1) % w
        idx = ia if idx is None else idx * w + ia
    return idx.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_tiled(x, window):
    return _window_reduce(x, window, -jnp.inf if
                          jnp.issubdtype(x.dtype, jnp.floating)
                          else jnp.iinfo(x.dtype).min,
                          lax.max)


def _max_pool_tiled_fwd(x, window):
    y = _max_pool_tiled(x, window)
    return y, (x, y)


def _max_pool_tiled_bwd(window, res, g):
    x, y = res
    eq = x == _upsample(y, window)
    # first-max tie break: the winning element is the eq element with the
    # smallest intra-window index. Window sizes are tiny (e.g. 8 for 2^3)
    # so the index field is exact even in bf16 (halves the reduce-min
    # traffic vs f32; falls back to f32 for huge windows).
    nwin = int(np.prod(window))
    idt = x.dtype if (jnp.issubdtype(x.dtype, jnp.floating)
                      and nwin <= 128) else jnp.float32
    idx = _intra_window_index(x.shape, window, idt)
    big = jnp.asarray(nwin, idt)
    cand = jnp.where(eq, idx, big)
    winner = _window_reduce(cand, window, big, lax.min)
    mask = cand == _upsample(winner, window)
    return (jnp.where(mask, _upsample(g, window), 0).astype(x.dtype),)


_max_pool_tiled.defvjp(_max_pool_tiled_fwd, _max_pool_tiled_bwd)


def max_pool(x, window, strides=None, padding='VALID'):
    """
    Max pooling over the spatial axes of [B, *spatial, C].

    Drop-in for `flax.linen.max_pool`. When the pooling is non-overlapping
    (strides == window) and every spatial dim divides evenly — the UNet
    case — the custom-backward tiled path is used; anything else falls
    back to the stock formulation.
    """
    window = tuple(int(w) for w in window)
    strides = window if strides is None else tuple(int(s) for s in strides)
    spatial = x.shape[1:-1]
    if (strides == window and len(spatial) == len(window)
            and all(s % w == 0 for s, w in zip(spatial, window))):
        if _use_pallas(x.shape, window, x.dtype):
            from neurite_tpu.ops.pool_pallas import max_pool2_3d
            return max_pool2_3d(x)
        return _max_pool_tiled(x, window)
    import flax.linen as nn
    return nn.max_pool(x, window_shape=window, strides=strides,
                       padding=padding)
