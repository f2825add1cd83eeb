"""
3-D convolution as a sum of z-shifted 2-D convolutions.

XLA's TPU conv3d path is far slower than its conv2d path at medical-image
shapes: measured fwd+bwd per conv at 128^3 C=16->16 bf16 on v5e, the
kd-term 2-D decomposition runs 0.66ms vs 8.58ms for native conv3d (13x) —
identical math (sum_a conv2d(shift_z(x, a), kernel[a])) and identical
parameters. This is the default 3-D conv implementation for the model
builders (`conv_impl='auto'`); outputs/gradients are parity-tested against
the native path.

Weight gradient (round 5): the default VJP of the per-tap sum computes kd
SEPARATE kernel-grad convolutions, each re-reading the full input and
cotangent volumes — ~5.5 ms of the 30 ms UNet-128^3 step (the largest
backward cluster, benchmarks/unet_profile.py). `dw_impl` selects a
single-pass formulation behind a custom VJP (forward and dx unchanged —
they are the transposes of the same per-tap graph):

- 'gstack': ONE 2-D kernel-grad conv against the z-stacked cotangent
  G3[z', a*F+co] = g[z'-a, co] — reads x once instead of kd times and
  yields every tap's dw side by side ([kh, kw, C, kd*F] -> reorder).
- 'conv3d': XLA's native conv3d kernel-grad (reads x and g exactly once).
- 'pertap': the round-2..4 behavior (plain jax.vjp of the tap sum).

All variants are bit-comparable formulations of the same sum; parity is
pinned in tests/test_ops_kernels.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


def _conv_z2d_core(x, kernel, form=None):
    """SAME/stride-1 z-decomposed conv, no bias: [B,D,H,W,C] x
    [kd,kh,kw,C,F] -> [B,D,H,W,F]. Dtypes must already match.

    form='inslice' (r2-r4): per tap, z-slab slice of the padded input ->
    conv2d -> sum. XLA lays these volumes out with z on LANES, so each
    input slab is a lane-shifted RELAYOUT COPY that cannot fuse into the
    conv operand — the round-5 profile bills ~12.5 ms/step of `slice` ops
    in the 26 ms UNet-128^3 step to exactly these.
    form='outslice' (r5, measured and REJECTED): conv the FULL padded
    plane stack once per tap and shift on the OUTPUT side, hoping the
    z-shifted output slices fuse into the add. In-step it measures
    39.04 ms vs 25.89 inslice (pool=1, 128^3) — the input slab copies
    overlap with compute in the real schedule while the lane-offset
    output adds serialize; kept as an opt-in so the measurement is
    reproducible."""
    b, d, h, w, c = x.shape
    kd = kernel.shape[0]
    f = kernel.shape[-1]
    pad_lo = (kd - 1) // 2
    pad_hi = kd - 1 - pad_lo
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
    if form is None:
        form = os.environ.get('NEURITE_Z2D_FORM', 'inslice')
    if form == 'outslice':
        dp = d + kd - 1
        x2 = xp.reshape(b * dp, h, w, c)
        dn2 = lax.conv_dimension_numbers(
            (b * dp, h, w, c), kernel.shape[1:], ('NHWC', 'HWIO', 'NHWC'))
        y = None
        for a in range(kd):
            part = lax.conv_general_dilated(
                x2, kernel[a], (1, 1), 'SAME', dimension_numbers=dn2)
            p5 = part.reshape(b, dp, h, w, f)
            # tap a of the sum reads padded plane z+a: take output rows
            # a..a+d of this tap's full-stack conv
            sh = lax.slice_in_dim(p5, a, a + d, axis=1)
            y = sh if y is None else y + sh
        return y
    dn2 = lax.conv_dimension_numbers(
        (b * d, h, w, c), kernel.shape[1:], ('NHWC', 'HWIO', 'NHWC'))
    y = None
    for a in range(kd):
        slab = lax.dynamic_slice_in_dim(xp, a, d, axis=1)
        slab = slab.reshape(b * d, h, w, c)
        part = lax.conv_general_dilated(
            slab, kernel[a], (1, 1), 'SAME', dimension_numbers=dn2)
        y = part if y is None else y + part
    return y.reshape(b, d, h, w, f)


def _dx_transpose(g, kernel, xshape):
    """Input grad: transpose of the per-tap sum (identical graph to the
    default VJP's dx — only dw is reformulated)."""
    f = lambda xx: _conv_z2d_core(xx, kernel)  # noqa: E731
    return jax.linear_transpose(
        f, jax.ShapeDtypeStruct(xshape, g.dtype))(g)[0]


def _dw_conv3d(g, x, kshape):
    """dw via XLA's native conv3d kernel-grad: one op, x and g read once."""
    dn = lax.conv_dimension_numbers(
        x.shape, kshape, ('NDHWC', 'DHWIO', 'NDHWC'))
    f = lambda k: lax.conv_general_dilated(  # noqa: E731
        x, k, (1, 1, 1), 'SAME', dimension_numbers=dn)
    return jax.linear_transpose(
        f, jax.ShapeDtypeStruct(kshape, g.dtype))(g)[0]


def _dw_gstack(g, x, kshape):
    """dw via ONE 2-D kernel-grad conv against the z-stacked cotangent.

    dw[a, kh, kw, ci, co] = sum_z xp[z+a, .., ci] * g[z, .., co]
                          = sum_z' xp[z', .., ci] * G3[z', .., a*F+co]
    with G3[z'] holding g[z'-a] (zero-padded). One conv reads x once and
    produces all kd taps stacked on the output-channel axis.
    """
    kd, kh, kw, c, f = kshape
    b, d, h, w, _ = x.shape
    pad_lo = (kd - 1) // 2
    pad_hi = kd - 1 - pad_lo
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
    dz = d + kd - 1
    g3 = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (a, kd - 1 - a), (0, 0), (0, 0), (0, 0)))
         for a in range(kd)], axis=-1)           # [b, dz, h, w, kd*f]
    x2 = xp.reshape(b * dz, h, w, c)
    g2 = g3.reshape(b * dz, h, w, kd * f)
    dn2 = lax.conv_dimension_numbers(
        x2.shape, (kh, kw, c, kd * f), ('NHWC', 'HWIO', 'NHWC'))
    fconv = lambda k2: lax.conv_general_dilated(  # noqa: E731
        x2, k2, (1, 1), 'SAME', dimension_numbers=dn2)
    dw2 = jax.linear_transpose(
        fconv, jax.ShapeDtypeStruct((kh, kw, c, kd * f), g.dtype))(g2)[0]
    return dw2.reshape(kh, kw, c, kd, f).transpose(3, 0, 1, 2, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_z2d_dw(x, kernel, dw_impl):
    return _conv_z2d_core(x, kernel)


def _conv_z2d_dw_fwd(x, kernel, dw_impl):
    return _conv_z2d_core(x, kernel), (x, kernel)


def _conv_z2d_dw_bwd(dw_impl, res, g):
    x, kernel = res
    dx = _dx_transpose(g, kernel, x.shape)
    if dw_impl == 'conv3d':
        dw = _dw_conv3d(g, x, kernel.shape)
    else:
        dw = _dw_gstack(g, x, kernel.shape)
    return dx, dw


_conv_z2d_dw.defvjp(_conv_z2d_dw_fwd, _conv_z2d_dw_bwd)


def conv_z2d(x, kernel, bias=None, dw_impl=None):
    """
    SAME-padding stride-1 3-D convolution via z-decomposed 2-D convs.

    x: [B, D, H, W, C]; kernel: [kd, kh, kw, C, F] (nn.Conv layout);
    bias: [F] or None. `dw_impl` in {'pertap', 'gstack', 'conv3d'} selects
    the weight-gradient formulation (None -> $NEURITE_DW_IMPL or 'gstack').
    """
    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel)
    assert x.ndim == 5 and kernel.ndim == 5, (x.shape, kernel.shape)
    if kernel.dtype != x.dtype:
        kernel = kernel.astype(x.dtype)
    if dw_impl is None:
        dw_impl = os.environ.get('NEURITE_DW_IMPL', 'pertap')
    if dw_impl == 'pertap':
        y = _conv_z2d_core(x, kernel)
    else:
        y = _conv_z2d_dw(x, kernel, dw_impl)
    if bias is not None:
        y = y + jnp.asarray(bias, y.dtype)
    return y
