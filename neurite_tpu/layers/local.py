"""
"Local" layers — per-voxel parameters — including the flagship
LocallyConnected (unshared-weight convolution).

Capability parity with reference `neurite/tf/layers.py` (cites per class),
re-designed TPU-first. The reference LocallyConnected3D ships THREE
implementations (python position loop / dense masked matmul / sparse matmul,
`layers.py:874-898`); on TPU there is one right shape: extract kernel patches
(static slices, fused by XLA) and run ONE batched matmul
`einsum('bvi,vio->bvo')` that maps directly onto the MXU with per-output-tile
weight slabs streamed from HBM.
"""

import itertools
import os
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.utils import spatial as tf_ops


def _normal_init(stddev=0.05, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)
    return init


class LocalBias(nn.Module):
    """Per-voxel additive bias: out[v] = in[v] + b[v]*mult (ref `layers.py:746-775`)."""
    my_initializer: Any = None
    biasmult: float = 1.0

    @nn.compact
    def __call__(self, x):
        init = self.my_initializer or _normal_init()
        kernel = self.param('kernel', init, x.shape[1:])
        return x + kernel * self.biasmult


class LocalLinear(nn.Module):
    """Per-voxel affine: out[v] = a[v]*in[v] + b[v] (ref `layers.py:778-808`)."""
    initializer: Any = None

    @nn.compact
    def __call__(self, x):
        init = self.initializer or _normal_init()
        mult = self.param('mult', init, x.shape[1:])
        bias = self.param('bias', init, x.shape[1:])
        return x * mult + bias


class LocalParamLayer(nn.Module):
    """
    Trainable free tensor exposed as a layer output (batch-broadcast).

    Parity: reference `layers.py:1711-1907` (LocalParamLayer /
    LocalParamWithInput / LocalParam). The reference needs keras-node hacks
    and a dummy-input variant; in flax a parameter is just a parameter — one
    clean module covers all three. Call with any tensor carrying the batch
    dimension (it is otherwise ignored).
    """
    shape: Sequence[int]
    initializer: Any = None
    mult: float = 1.0

    @nn.compact
    def __call__(self, x=None, batch_size=None):
        init = self.initializer or _normal_init()
        kernel = self.param('kernel', init, tuple(self.shape))
        out = kernel[None] * self.mult
        if x is not None:
            batch_size = jnp.shape(x)[0]
        if batch_size is not None:
            out = jnp.broadcast_to(out, (batch_size, *self.shape))
        return out


LocalParamWithInput = LocalParamLayer
LocalParam = LocalParamLayer


class LocalCrossLinear(nn.Module):
    """
    Per-voxel feature mixing: out[b,v,:] = in[b,v,:] @ M[v] (+ bias[v]).

    Parity: reference `layers.py:1535-1607`, replacing tf.map_fn with one
    einsum — a batched [*vol, Cin, Cout] matmul on the MXU.
    """
    output_features: int
    mult_initializer: Any = None
    bias_initializer: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_feats = x.shape[-1]
        mult_init = self.mult_initializer or _normal_init(
            mean=1 / in_feats, stddev=0.01)
        mult = self.param('mult', mult_init,
                          (1, *x.shape[1:], self.output_features))
        y = jnp.einsum('b...i,...io->b...o', x, mult[0],
                       preferred_element_type=x.dtype)
        if self.use_bias:
            bias_init = self.bias_initializer or _normal_init(
                mean=1 / in_feats, stddev=0.01)
            bias = self.param('bias', bias_init,
                              (1, *x.shape[1:-1], self.output_features))
            y = y + bias
        return y


class LocalCrossLinearTrf(nn.Module):
    """
    Per-voxel feature mixing where each (in, out) connection additionally
    warps its input by a learned per-connection displacement field.

    Parity: reference `layers.py:1610-1708`. NOTE: the reference code is
    broken — `transform` is never imported there (`layers.py:1697` would
    raise NameError); this is the working equivalent, with the (Cin, Cout)
    double python loop replaced by vmaps.
    """
    output_features: int
    mult_initializer: Any = None
    bias_initializer: Any = None
    use_bias: bool = True
    trf_mult: float = 1
    interp_method: str = 'linear'

    @nn.compact
    def __call__(self, x):
        vol_shape = x.shape[1:-1]
        in_feats = x.shape[-1]
        ndims = len(vol_shape)

        mult_init = self.mult_initializer or _normal_init(
            mean=1 / in_feats, stddev=0.01)
        mult = self.param('mult', mult_init,
                          (*vol_shape, in_feats, self.output_features))
        trf = self.param('trf', _normal_init(stddev=0.001),
                         (*vol_shape, in_feats, self.output_features, ndims))

        def warp_one(vol_i, trf_ij):
            out = tf_ops.transform(vol_i, trf_ij * self.trf_mult,
                                   interp_method=self.interp_method)
            return out.reshape(vol_shape)

        def single_item(vol):  # vol: [*vol_shape, Cin]
            # warp input i by trf[..., i, j, :] for every (i, j)
            vols_i = jnp.moveaxis(vol, -1, 0)  # [Cin, *vol]
            trf_ij = jnp.moveaxis(trf, (-3, -2), (0, 1))  # [Cin, Cout, *vol, N]
            warped = jax.vmap(lambda vi, ti: jax.vmap(
                lambda tj: warp_one(vi, tj))(ti))(vols_i, trf_ij)
            # warped: [Cin, Cout, *vol]; weight and sum over Cin
            w = jnp.moveaxis(mult, (-2, -1), (0, 1))  # [Cin, Cout, *vol]
            y = jnp.sum(warped * w, axis=0)  # [Cout, *vol]
            return jnp.moveaxis(y, 0, -1)

        y = jax.vmap(single_item)(x)
        if self.use_bias:
            bias_init = self.bias_initializer or _normal_init(
                mean=1 / in_feats, stddev=0.01)
            bias = self.param('bias', bias_init,
                              (*vol_shape, self.output_features))
            # reference adds bias once per input feature inside the loop
            # (layers.py:1703-1704) => effectively Cin times
            y = y + bias * in_feats
        return y


def _extract_patches(x, kernel_size, strides, padding):
    """
    [B, *spatial, C] -> [B, *out_spatial, K, C] where K = prod(kernel_size),
    kernel-position-major / channel-minor — matching the keras LC weight
    layout (feature_dim = prod(k) * C, ref `layers.py:1142`).

    Static slices only: XLA fuses them into the downstream matmul's operand
    feeds; nothing is materialized at 27x size on TPU.
    """
    ndims = len(kernel_size)
    if padding == 'same':
        pads = [(0, 0)]
        for d in range(ndims):
            total = kernel_size[d] - 1
            pads.append((total // 2, total - total // 2))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
    out_shape = [(x.shape[1 + d] - kernel_size[d]) // strides[d] + 1
                 for d in range(ndims)]

    slabs = []
    for offsets in itertools.product(*[range(k) for k in kernel_size]):
        sl = tuple(
            slice(offsets[d], offsets[d] + (out_shape[d] - 1) * strides[d] + 1,
                  strides[d]) for d in range(ndims))
        slabs.append(x[(slice(None), *sl, slice(None))])
    patches = jnp.stack(slabs, axis=-2)  # [B, *out, K, C]
    return patches, out_shape


def _lc_out_shape(spatial, kernel_size, strides, padding):
    """Output spatial shape of a locally-connected conv."""
    if padding == 'same':
        spatial = [s + k - 1 for s, k in zip(spatial, kernel_size)]
    return [(spatial[d] - kernel_size[d]) // strides[d] + 1
            for d in range(len(kernel_size))]


def _lc_per_tap(x, kernel, kernel_size, strides, padding, filters):
    """
    Locally-connected conv as a sum of per-tap VPU multiply-reduces.

    y[b, v, o] = sum_tap sum_c shift_tap(x)[b, v, c] * k[v, tap*C + c, o].
    Each term is elementwise over a shifted view of (padded) x and a static
    channel-slice of the kernel — nothing is materialized at k^N size and
    no batched matmul is emitted. Accumulation in f32.
    """
    ndims = len(kernel_size)
    in_ch = x.shape[-1]
    if padding == 'same':
        pads = [(0, 0)]
        for d in range(ndims):
            total = kernel_size[d] - 1
            pads.append((total // 2, total - total // 2))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
    out_shape = [(x.shape[1 + d] - kernel_size[d]) // strides[d] + 1
                 for d in range(ndims)]
    nb_out = int(np.prod(out_shape))

    y = None
    for tap, offsets in enumerate(
            itertools.product(*[range(k) for k in kernel_size])):
        sl = tuple(
            slice(offsets[d], offsets[d] + (out_shape[d] - 1) * strides[d] + 1,
                  strides[d]) for d in range(ndims))
        xs = x[(slice(None), *sl, slice(None))]
        xs = xs.reshape(xs.shape[0], nb_out, in_ch, 1)
        kt = kernel[:, tap * in_ch:(tap + 1) * in_ch, :][None]
        term = jnp.sum((xs * kt).astype(jnp.float32), axis=-2)
        y = term if y is None else y + term
    return y, out_shape


class LocallyConnected(nn.Module):
    """
    N-D locally-connected (unshared-weight) convolution.

    Parity: reference LocallyConnected3D `layers.py:811-1532` (itself ported
    from keras LC2D). Weight shape (output_items, prod(k)*Cin, filters) and
    per-position bias match keras. `implementation` is accepted for API
    parity and ignored — on TPU the patches+batched-matmul form IS the fast
    path (the reference's impl-2 "dense matmul" insight, without the
    connectivity-mask blowup).

    kernel_layout selects the parameter storage: 'keras' = [V, prod(k)*Cin,
    filters] (reference layout); 'transposed' = [filters, prod(k)*Cin, V]
    (lane-dense tap rows — the head fast path, docs/DESIGN.md "LC head");
    'auto' (default) picks 'transposed' for single-filter stride-1 layers
    with Cin <= 64 (filters > 1 measured fastest on the MXU einsum path —
    docs/DESIGN.md "LC head"). NOTE under 'auto' the stored SHAPE depends
    on the
    input's channel count — resizing channels across the boundary
    shape-breaks checkpoints (migrate with `ops.lc_tap.keras_to_transposed`
    / `transposed_to_keras`), and fan-out-sensitive initializers (glorot)
    see fan_out = V instead of filters in the transposed layout (lecun /
    fan-in initializers are identical: fan_in = prod(k)*Cin either way).
    Pin `kernel_layout` explicitly when either caveat matters
    (docs/MIGRATION.md "LocallyConnected kernel layout").
    """
    filters: int
    kernel_size: Union[int, Sequence[int]]
    rank: int = 3
    strides: Union[int, Sequence[int]] = 1
    padding: str = 'valid'
    activation: Optional[Callable] = None
    use_bias: bool = True
    kernel_initializer: Any = nn.initializers.lecun_normal()
    bias_initializer: Any = nn.initializers.zeros_init()
    implementation: int = 2  # ignored; API parity
    kernel_layout: str = 'auto'  # 'auto' | 'transposed' | 'keras'
    # param_dtype=bf16 halves the HBM traffic of the [V, k^N*Cin, Cout]
    # weight tensor — the layer is bandwidth-bound at head scale (450M
    # params at 160^3) — at a documented precision cost; accumulation
    # stays f32 either way.
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ndims = self.rank
        assert x.ndim == ndims + 2, \
            f'expected rank-{ndims + 2} input, got {x.ndim}'
        ks = self.kernel_size
        ks = (ks,) * ndims if isinstance(ks, int) else tuple(ks)
        st = self.strides
        st = (st,) * ndims if isinstance(st, int) else tuple(st)
        padding = self.padding.lower()
        assert padding in ('valid', 'same'), f'bad padding {self.padding}'

        in_ch = x.shape[-1]
        # barrier: stops XLA fusing upstream compute into the k^N patch
        # slabs (which would replicate it k^N times) and fixes a remote-
        # compiler crash when a z-decomposed conv trunk feeds this layer at
        # 160^3 (docs/DESIGN.md). Semantically the identity.
        x = jax.lax.optimization_barrier(x)
        nb_out_sp = _lc_out_shape(x.shape[1:-1], ks, st, padding)
        nb_out = int(np.prod(nb_out_sp))
        feature_dim = int(np.prod(ks)) * in_ch

        # head-style layers (tiny Cin x Cout per voxel, stride 1) store the
        # kernel TRANSPOSED, [O, feature_dim, V]: every tap's weights are
        # dense full-lane rows read once per pass, where the keras layout's
        # per-tap minor-dim slices re-read ~k^N x the kernel bytes — the
        # dominant cost of the 447M-param head (ops/lc_tap.py; measured
        # numbers in docs/DESIGN.md "LC head"). Checkpoint migration:
        # ops.lc_tap.keras_to_transposed / transposed_to_keras. lecun
        # initialization is identical (fan_in = feature_dim either way).
        assert self.kernel_layout in ('auto', 'transposed', 'keras'), \
            f'bad kernel_layout {self.kernel_layout}'
        if self.kernel_layout == 'auto':
            # transposed storage wins ONLY for single-filter heads (r4
            # measurement, benchmarks/lc_filters.py at 96^3 C=4 O=4,
            # 0.38G params: einsum fwd+grad 8.9 ms vs per-tap 24.4,
            # Pallas 41.5, XLA-transposed 147.9 — at filters>1 the MXU
            # batched matmul is the fastest form by 3-16x, while at
            # filters=1 it wastes the MXU and patch extraction dominates,
            # where transposed+Pallas took the config-#3 step 132.7->80.7)
            transposed = self.filters == 1 and in_ch <= 64 \
                and all(s == 1 for s in st)
        else:
            transposed = self.kernel_layout == 'transposed'
            assert not transposed or all(s == 1 for s in st), \
                "kernel_layout='transposed' supports stride 1 only"
        kshape = ((self.filters, feature_dim, nb_out) if transposed
                  else (nb_out, feature_dim, self.filters))
        kernel = self.param('kernel', self.kernel_initializer, kshape,
                            self.param_dtype)
        ct = self.dtype or x.dtype
        if kernel.dtype != ct:
            kernel = kernel.astype(ct)

        # NEURITE_PALLAS_LC: unset/'auto' = DEFAULT-ON for supported shapes
        # on a single-chip TPU (the v2 kernel measured a win in the full
        # config-#3 step, 113.2 -> 96.4ms, and the custom-call blast radius
        # no longer reproduces on this runtime — docs/DESIGN.md); '1' =
        # force (even multi-device — caller asserts no GSPMD partitioning
        # of the layer); '0' = off; 'interpret' = CPU wiring path.
        lc_flag = os.environ.get('NEURITE_PALLAS_LC', 'auto')
        interpret = lc_flag == 'interpret'  # CPU-testable wiring path
        from neurite_tpu import backend
        if lc_flag in ('auto', ''):
            # SINGLE-CHIP ONLY by default: GSPMD cannot partition the
            # custom call, so multi-device processes (param_specs tensor-
            # parallel or spatial sharding) keep the XLA path unless forced
            want = backend.is_tpu() and len(jax.devices()) == 1
        else:
            want = lc_flag == '1' and backend.is_tpu()
        use_pallas = ndims == 3 and transposed and (interpret or want)
        if use_pallas:
            from neurite_tpu.ops import pallas_lc2
            use_pallas = pallas_lc2.supported(x.shape, ks, self.filters, st,
                                              padding)
        if use_pallas:
            # Pallas v2 kernel (ops/pallas_lc2.py): transposed-layout
            # blocks with one double-buffered halo DMA each — the pattern
            # this pool's remote Mosaic compiler accepts (the v1 multi-DMA
            # kernel in ops/pallas_lc.py does not; see
            # benchmarks/pallas_lc_probe.py).
            from neurite_tpu.ops import pallas_lc2
            y = pallas_lc2.lc_transposed_pallas(x.astype(ct), kernel, ks,
                                                interpret)
            y = y.astype(x.dtype)
            out_shape = list(x.shape[1:-1])
            y = y.reshape(y.shape[0], nb_out, self.filters)
        elif transposed:
            # head-style layers: transposed-layout tap sum (ops/lc_tap.py) —
            # dense full-lane kernel rows, fused strided x views, no patch
            # tensor, plain jax.grad backward. 132.7 -> 113.2ms measured
            # step (docs/DESIGN.md "LC head").
            from neurite_tpu.ops import lc_tap
            y = lc_tap.lc_transposed(x.astype(ct), kernel, ks, padding)
            y = y.astype(x.dtype)
            out_shape = _lc_out_shape(x.shape[1:-1], ks, st, padding)
            y = y.reshape(y.shape[0], nb_out, self.filters)
        elif (in_ch * self.filters <= 64
              and nb_out * feature_dim * 4 > 2 ** 30):
            # small per-voxel matrices at huge V: the einsum path's f32
            # patch tensor ([V, k^N*Cin], > 1 GB here) OOMs head-scale
            # volumes (measured at 160^3); the per-tap VPU multiply-reduce
            # never materializes it (fwd+grad 24.4 ms vs einsum 8.9 at
            # 96^3 C=4 O=4 — einsum wins when the patches fit)
            y, out_shape = _lc_per_tap(x.astype(ct), kernel, ks, st, padding,
                                       self.filters)
            y = y.astype(x.dtype)
        else:
            patches, out_shape = _extract_patches(x, ks, st, padding)
            if patches.dtype != ct:
                patches = patches.astype(ct)
            p = patches.reshape(patches.shape[0], nb_out, feature_dim)
            # one batched local matmul on the MXU:
            # [B,V,I] x [V,I,O] -> [B,V,O]
            y = jnp.einsum('bvi,vio->bvo', p, kernel,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(y.shape[0], *out_shape, self.filters)

        if self.use_bias:
            bias = self.param('bias', self.bias_initializer,
                              (*out_shape, self.filters), self.param_dtype)
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


class LocallyConnected1D(LocallyConnected):
    rank: int = 1


class LocallyConnected2D(LocallyConnected):
    rank: int = 2


class LocallyConnected3D(LocallyConnected):
    rank: int = 3
