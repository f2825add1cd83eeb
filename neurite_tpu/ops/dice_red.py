"""
Fused Dice reduction Pallas kernel.

Dice needs three per-label sums over the voxel axis — sum(x*y), sum(x^2),
sum(y^2) (reference `neurite/tf/metrics.py:476-482`). This kernel streams
both probability maps through VMEM once and accumulates all three partials
per chunk, so HBM traffic is exactly one read of each map (XLA usually fuses
this too; the kernel pins the guarantee and is the building block for the
spatially-sharded metric where each shard reduces locally before one psum).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024


def _kernel(x_ref, y_ref, xy_ref, xx_ref, yy_ref, *, n_vox, chunk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xy_ref[:] = jnp.zeros_like(xy_ref)
        xx_ref[:] = jnp.zeros_like(xx_ref)
        yy_ref[:] = jnp.zeros_like(yy_ref)

    x = x_ref[0]                                            # [chunk, L]
    y = y_ref[0]
    if n_vox % chunk:
        vox0 = j * chunk
        valid = (vox0 + jax.lax.broadcasted_iota(
            jnp.int32, x.shape, 0)) < n_vox
        x = jnp.where(valid, x, 0.)
        y = jnp.where(valid, y, 0.)

    xy_ref[0] += jnp.sum(x * y, axis=0)
    xx_ref[0] += jnp.sum(x * x, axis=0)
    yy_ref[0] += jnp.sum(y * y, axis=0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _dice_sums_p(x, y, interpret=False):
    bs, n_vox, nb_labels = x.shape
    chunk = min(_CHUNK, max(8, n_vox))
    n_chunks = pl.cdiv(n_vox, chunk)
    pad = n_chunks * chunk - n_vox
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)))

    kernel = functools.partial(_kernel, n_vox=n_vox, chunk=chunk)
    chunk_spec = pl.BlockSpec((1, chunk, nb_labels), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    sum_spec = pl.BlockSpec((1, nb_labels), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_chunks),
        in_specs=[chunk_spec, chunk_spec],
        out_specs=[sum_spec, sum_spec, sum_spec],
        out_shape=[jax.ShapeDtypeStruct((bs, nb_labels), jnp.float32)] * 3,
        interpret=interpret,
    )(x, y)
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dice_sums_ad(x, y, interpret):
    return _dice_sums_p(x, y, interpret=interpret)


def _dice_sums_fwd(x, y, interpret):
    return _dice_sums_p(x, y, interpret=interpret), (x, y)


def _dice_sums_bwd(interpret, res, g):
    # d sum_v(xy)/dx = y; d sum_v(x^2)/dx = 2x — one fused jnp pass
    x, y = res
    g_xy, g_xx, g_yy = (gi[:, None, :] for gi in g)
    return g_xy * y + 2. * g_xx * x, g_xy * x + 2. * g_yy * y


_dice_sums_ad.defvjp(_dice_sums_fwd, _dice_sums_bwd)


def dice_sums(x, y, impl='auto', interpret=False):
    """
    One-pass Dice partial sums.

    Args:
        x, y: [bs, V, L] float probability maps.
        impl: 'auto' (pallas on TPU, jnp elsewhere), 'pallas', or 'jnp'.

    Returns:
        (sum_xy, sum_xx, sum_yy), each [bs, L] float32.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if impl == 'auto':
        # measured on v5e: XLA's own fusion of the three sums beats the
        # pallas kernel (3.7ms vs 9.0ms at 128^3, L=8) — XLA already emits a
        # single pass here. The kernel remains for sharded-metric composition.
        impl = 'jnp'
    if impl == 'pallas':
        return _dice_sums_ad(x, y, interpret)
    return (jnp.sum(x * y, 1), jnp.sum(x * x, 1), jnp.sum(y * y, 1))
