"""
Fused soft-quantize + MI joint-histogram Pallas kernel.

The jnp MI path (`neurite_tpu.metrics.MutualInformation.maps`, parity with
reference `neurite/tf/metrics.py:228-282`) materializes two soft-quantized
maps [bs, V, B] in HBM (for a 128^3 volume with 32 bins that is 2x268 MB of
traffic) before the joint-histogram matmul. This kernel streams the raw
volumes once: per V-chunk it computes the RBF binning
`exp(-alpha * (clip(x) - c)^2)` in VMEM (reference formula
`neurite/tf/utils/utils.py:1095-1172`) and accumulates

    pxy += xq^T yq        (MXU, [B, B])
    px  += sum_v xq       ([B])
    py  += sum_v yq       ([B])

so HBM traffic is exactly 2*V*4 bytes per batch item. The caller finishes the
(cheap, [B,B]-sized) normalization and log-sum in jnp.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 4096


def _kernel(x_ref, y_ref, cbx_ref, cby_ref, alpha_ref, pxy_ref, px_ref,
            py_ref, *, nb_bins, n_vox, chunk, min_clip, max_clip):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        pxy_ref[:] = jnp.zeros_like(pxy_ref)
        px_ref[:] = jnp.zeros_like(px_ref)
        py_ref[:] = jnp.zeros_like(py_ref)

    alpha = alpha_ref[0]
    centers_x = cbx_ref[0, :]                               # [B]
    centers_y = cby_ref[0, :]

    x = x_ref[0, :].reshape(chunk, 1)                       # sublane-major
    y = y_ref[0, :].reshape(chunk, 1)
    if np.isfinite(min_clip) or np.isfinite(max_clip):
        x = jnp.clip(x, min_clip, max_clip)
        y = jnp.clip(y, min_clip, max_clip)

    xq = jnp.exp(-alpha * jnp.square(x - centers_x[None, :]))  # [chunk, B]
    yq = jnp.exp(-alpha * jnp.square(y - centers_y[None, :]))

    if n_vox % chunk:
        # mask tail voxels of the final chunk (padding must not hit the bins)
        vox0 = j * chunk
        valid = (vox0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                 ) < n_vox
        xq = jnp.where(valid, xq, 0.)
        yq = jnp.where(valid, yq, 0.)

    pxy_ref[0] += jax.lax.dot_general(
        xq, yq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    px_ref[0] += jnp.sum(xq, axis=0)
    py_ref[0] += jnp.sum(yq, axis=0)


@functools.partial(jax.jit, static_argnames=('min_clip', 'max_clip',
                                             'interpret'))
def _mi_histograms_p(x, y, bin_centers_x, bin_centers_y, alpha,
                     min_clip=-np.inf, max_clip=np.inf, interpret=False):
    bs, n_vox = x.shape
    nb_bins = bin_centers_x.shape[0]
    chunk = min(_CHUNK, max(512, n_vox))
    n_chunks = pl.cdiv(n_vox, chunk)
    pad = n_chunks * chunk - n_vox
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        y = jnp.pad(y, ((0, 0), (0, pad)))

    kernel = functools.partial(
        _kernel, nb_bins=nb_bins, n_vox=n_vox, chunk=chunk,
        min_clip=min_clip, max_clip=max_clip)

    grid = (bs, n_chunks)
    chunk_spec = pl.BlockSpec((1, chunk), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    fixed = lambda i, j: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            chunk_spec, chunk_spec,
            pl.BlockSpec((1, nb_bins), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_bins), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nb_bins, nb_bins), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_bins), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_bins), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nb_bins, nb_bins), jnp.float32),
            jax.ShapeDtypeStruct((bs, nb_bins), jnp.float32),
            jax.ShapeDtypeStruct((bs, nb_bins), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, bin_centers_x.reshape(1, nb_bins),
      bin_centers_y.reshape(1, nb_bins), jnp.reshape(alpha, (1,)))
    return tuple(out)


def _mi_histograms_jnp(x, y, bin_centers_x, bin_centers_y, alpha,
                       min_clip=-np.inf, max_clip=np.inf):
    """Reference jnp path (XLA-fused; used off-TPU and as the parity oracle)."""
    def quant(v, centers):
        v = jnp.clip(v[..., None], min_clip, max_clip)
        return jnp.exp(-alpha * jnp.square(v - centers))
    xq = quant(x, bin_centers_x)
    yq = quant(y, bin_centers_y)
    pxy = jnp.einsum('bvi,bvj->bij', xq, yq,
                     preferred_element_type=jnp.float32)
    return pxy, jnp.sum(xq, 1), jnp.sum(yq, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _mi_histograms_ad(x, y, bin_centers_x, bin_centers_y, alpha, min_clip,
                      max_clip, interpret):
    return _mi_histograms_p(x, y, bin_centers_x, bin_centers_y, alpha,
                            min_clip=min_clip, max_clip=max_clip,
                            interpret=interpret)


def _mi_histograms_fwd(x, y, bin_centers_x, bin_centers_y, alpha, min_clip,
                       max_clip, interpret):
    out = _mi_histograms_p(x, y, bin_centers_x, bin_centers_y, alpha,
                           min_clip=min_clip, max_clip=max_clip,
                           interpret=interpret)
    return out, (x, y, bin_centers_x, bin_centers_y, alpha)


def _mi_histograms_bwd(min_clip, max_clip, interpret, res, g):
    # recompute the quantized maps in the backward pass (jnp; XLA fuses) —
    # forward stays single-pass, backward pays the [bs,V,B] pipe once.
    x, y, centers_x, centers_y, alpha = res
    g_pxy, g_px, g_py = g

    def quant_and_grad(v, centers):
        vc = jnp.clip(v, min_clip, max_clip)
        diff = vc[..., None] - centers                     # [bs, V, B]
        q = jnp.exp(-alpha * jnp.square(diff))
        inside = (v >= min_clip) & (v <= max_clip)  # matches jnp.clip VJP
        dq_dv = q * (-2. * alpha) * diff * inside[..., None]
        return q, dq_dv

    xq, dxq = quant_and_grad(x, centers_x)
    yq, dyq = quant_and_grad(y, centers_y)
    tx = jnp.einsum('bij,bvj->bvi', g_pxy, yq) + g_px[:, None, :]
    ty = jnp.einsum('bij,bvi->bvj', g_pxy, xq) + g_py[:, None, :]
    dx = jnp.sum(tx * dxq, -1)
    dy = jnp.sum(ty * dyq, -1)
    return (dx, dy, jnp.zeros_like(centers_x), jnp.zeros_like(centers_y),
            jnp.zeros_like(alpha))


_mi_histograms_ad.defvjp(_mi_histograms_fwd, _mi_histograms_bwd)


def mi_histograms(x, y, bin_centers, alpha, min_clip=-np.inf,
                  max_clip=np.inf, impl='auto', interpret=False,
                  bin_centers_y=None):
    """
    Unnormalized soft-MI histograms for batched flat volumes.

    Args:
        x, y: [bs, V] float32 raw intensities.
        bin_centers: [B] float32 (for x; also for y unless bin_centers_y).
        alpha: scalar RBF sharpness (1 / (2 sigma^2)).
        min_clip/max_clip: static intensity clip bounds.
        impl: 'auto' (pallas on TPU, jnp elsewhere), 'pallas', or 'jnp'.
        bin_centers_y: optional separate [B] centers for y (the reference
            derives centers per-tensor when none are configured).

    Returns:
        (pxy [bs, B, B], px [bs, B], py [bs, B]) — raw sums, not normalized.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    cbx = jnp.asarray(bin_centers, jnp.float32)
    cby = cbx if bin_centers_y is None else \
        jnp.asarray(bin_centers_y, jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    if impl == 'auto':
        from neurite_tpu import backend
        impl = 'pallas' if backend.is_tpu() else 'jnp'
    if impl == 'pallas':
        return _mi_histograms_ad(x, y, cbx, cby, alpha,
                                 float(min_clip), float(max_clip), interpret)
    return _mi_histograms_jnp(x, y, cbx, cby, alpha,
                              min_clip=min_clip, max_clip=max_clip)
