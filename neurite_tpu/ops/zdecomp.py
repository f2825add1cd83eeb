"""
3-D convolution as a sum of z-shifted 2-D convolutions.

XLA's TPU conv3d path is far slower than its conv2d path at medical-image
shapes: measured fwd+bwd per conv at 128^3 C=16->16 bf16 on v5e, the
kd-term 2-D decomposition runs 0.66ms vs 8.58ms for native conv3d (13x) —
identical math (sum_a conv2d(shift_z(x, a), kernel[a])) and identical
parameters. This is the default 3-D conv implementation for the model
builders (`conv_impl='auto'`); outputs/gradients are parity-tested against
the native path.
"""

import jax
import jax.numpy as jnp


def conv_z2d(x, kernel, bias=None):
    """
    SAME-padding stride-1 3-D convolution via z-decomposed 2-D convs.

    x: [B, D, H, W, C]; kernel: [kd, kh, kw, C, F] (nn.Conv layout);
    bias: [F] or None.
    """
    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel)
    assert x.ndim == 5 and kernel.ndim == 5, (x.shape, kernel.shape)
    b, d, h, w, c = x.shape
    kd = kernel.shape[0]
    f = kernel.shape[-1]
    if kernel.dtype != x.dtype:
        kernel = kernel.astype(x.dtype)

    pad_lo = (kd - 1) // 2
    pad_hi = kd - 1 - pad_lo
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))

    dn2 = jax.lax.conv_dimension_numbers(
        (b * d, h, w, c), kernel.shape[1:], ('NHWC', 'HWIO', 'NHWC'))
    y = None
    for a in range(kd):
        slab = jax.lax.dynamic_slice_in_dim(xp, a, d, axis=1)
        slab = slab.reshape(b * d, h, w, c)
        part = jax.lax.conv_general_dilated(
            slab, kernel[a], (1, 1), 'SAME', dimension_numbers=dn2)
        y = part if y is None else y + part
    y = y.reshape(b, d, h, w, f)
    if bias is not None:
        y = y + jnp.asarray(bias, y.dtype)
    return y
