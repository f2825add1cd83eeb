"""
1-D SAME convolution along an axis as a banded [L, L] MXU matmul.

`separable_conv`'s per-axis pass is a conv with ONE output channel — on the
MXU that is an N=1 matmul wasting 127/128 lanes. For axes short enough that
an [L, L] band matrix is cheap (L <= ~512), the same pass expressed as
`x @ B` fills the lanes with the axis itself: measured on v5e at 128^3 f32,
the synthesis bias-field blur (window 165) drops from 11.7ms (+2.8ms layout
copies) per axis to sub-ms, and even the k=7 image blur improves (see
docs/DESIGN.md "Where the reference's hot ops went").

The band matrix B[i, j] = k[i - j + r] for |i - j| <= r reproduces
`lax.conv_general_dilated`'s SAME/stride-1 cross-correlation (zero padding)
exactly; accumulation is forced to f32 via `preferred_element_type`, like
the conv path. Kernels may be traced (random sigmas) — only the length is
static.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# longest axis routed through the band matmul: per-point cost is L MACs
# (vs the kernel width for a conv), so very long axes should stay convs;
# medical volumes are 64-256 per axis where the matmul always wins.
_MM_MAX_LEN = 384


@functools.lru_cache(maxsize=256)
def _band_index_mask(length, width):
    """Static ([L, L] kernel-tap index, [L, L] in-band mask) as numpy."""
    r = (width - 1) // 2
    i = np.arange(length)[:, None]
    j = np.arange(length)[None, :]
    # SAME cross-correlation: out[j] = sum_t x[j + t - r] k[t]
    # => B[i, j] = k[i - j + r]  (i = source index)
    t = i - j + r
    mask = (t >= 0) & (t < width)
    return np.clip(t, 0, width - 1), mask


def band_matrix(kernel, length):
    """[L, L] band matrix B with x_new = x @ B == SAME-conv(x, kernel)."""
    kernel = jnp.ravel(kernel)
    width = int(kernel.shape[0])
    idx, mask = _band_index_mask(int(length), width)
    B = jnp.take(kernel, jnp.asarray(idx))
    return jnp.where(jnp.asarray(mask), B, jnp.zeros((), kernel.dtype))


def conv1d_mm(xr, kernel):
    """
    SAME/stride-1 conv of [pre, L, post, 1] along axis 1 via the band matmul.

    Matches `lax.conv_general_dilated(xr, k.reshape(w,1,1,1), (1,1), 'SAME')`
    on the same operands to f32 accumulation order.
    """
    pre, L, post, _ = xr.shape
    B = band_matrix(kernel, L)
    # f32 inputs: HIGHEST keeps full f32 accuracy on the MXU (the conv path
    # this replaces truncates to bf16 passes — the matmul form is both
    # faster AND more accurate); bf16 inputs keep the fast path.
    prec = (jax.lax.Precision.HIGHEST
            if xr.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    y = jax.lax.dot_general(
        xr.reshape(pre, L, post), B.astype(xr.dtype),
        (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)          # [pre, post, L]
    y = jnp.moveaxis(y, -1, 1).astype(xr.dtype)
    return y.reshape(pre, L, post, 1)
