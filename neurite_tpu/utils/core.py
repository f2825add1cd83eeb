"""
N-D tensor ops — the foundation layer of neurite_tpu.

Capability parity with reference `neurite/tf/utils/utils.py` (file:line cites on each
function), re-designed TPU-first:

- pure jnp functions, jit/vmap/grad-composable, static shapes throughout;
- gathers are flat single-axis gathers (XLA lowers these well on TPU);
- randomized ops take explicit `jax.random` keys instead of hidden global RNG state;
- the hot interpolation path dispatches to windowed MXU engines and a
  Pallas kernel (`neurite_tpu.ops.warp`, `neurite_tpu.ops.pallas_warp`)
  on TPU backends (`interpn(impl='window')`).
"""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.py.utils import normalize_axes

__all__ = [
    'setup_device', 'interpn', 'resize', 'zoom', 'map_fn_axis',
    'volshape_to_ndgrid', 'volshape_to_meshgrid', 'ndgrid', 'meshgrid',
    'flatten', 'take', 'barycenter',
    'gaussian_kernel', 'separable_conv', 'subsample_axis',
    'softmax', 'logtanh', 'arcsinh', 'logistic', 'sigmoid',
    'logistic_fixed_ends', 'sigmoid_fixed_ends', 'soft_round', 'soft_delta',
    'odd_shifted_relu', 'minmax_norm', 'whiten', 'perlin_vol',
    'sub2ind2d', 'prod_n', 'soft_quantize', 'soft_digitize',
    'batch_channel_flatten', 'flatten_batch_channel', 'flatten_axes',
    'fftn', 'ifftn', 'fftshift', 'ifftshift',
    'complex_to_channels', 'channels_to_complex', 'batch_gather',
    'space_to_depth', 'depth_to_space',
    'as_key',
]


def as_key(seed):
    """Accept either a PRNG key or an int seed and return a PRNG key."""
    if seed is None:
        raise ValueError('a seed or jax.random key is required for randomized ops')
    if isinstance(seed, (int, np.integer)):
        return jax.random.PRNGKey(seed)
    return seed


def setup_device(gpuid=None):
    """
    Device setup — TPU-native equivalent of reference `setup_device`
    (`neurite/tf/utils/utils.py:38-70`, CUDA device strings + TF memory
    growth). Here devices are managed by the JAX runtime; this returns the
    device list (optionally one device by index) for explicit `device_put` /
    mesh construction. Multi-device policy lives in `neurite_tpu.parallel`.
    """
    devices = jax.devices()
    if gpuid is None or (isinstance(gpuid, str) and gpuid == ''):
        return devices
    if isinstance(gpuid, str):
        gpuid = int(gpuid.split(',')[0])
    return [devices[int(gpuid)]]


###############################################################################
# interpolation
###############################################################################

def interpn(vol, loc, interp_method='linear', fill_value=None, impl='auto',
            max_disp=8.0, block=None, guard='runtime'):
    """
    N-D gridded interpolation (linear or nearest) of `vol` at locations `loc`.

    Parameters:
        vol: array of shape [*vol_shape] or [*vol_shape, C].
        loc: list of N arrays (same shape each) or one array [*out_shape, N]
            of voxel-space interpolation coordinates.
        interp_method: 'linear' or 'nearest'.
        fill_value: value for out-of-domain points; None clamps to the edge.

    Returns:
        Interpolated volume shaped like the loc entries (+C if vol had channels).

    Parity: reference `neurite/tf/utils/utils.py:73-220`. The reference unrolls a
    2^N-corner gather chain over flat indices (`sub2ind2d` + `tf.gather`); we keep
    the same math (identical corner weights and clipping, so outputs match to
    float tolerance) but express it as flat jnp gathers that XLA fuses. TPU fast
    paths for the 3-D case live in `neurite_tpu.ops.warp`: `impl='window'` is the
    unbounded-exact block-windowed MXU engine with gather fallback
    (`interpn_window`), `impl='onehot'` the bounded-displacement engine.
    """
    if isinstance(loc, (list, tuple)):
        loc = jnp.stack(loc, -1)
    nb_dims = loc.shape[-1]
    input_vol_ndim = jnp.ndim(vol)
    vol = jnp.asarray(vol)

    # impl='rows' selects the row-gather formulation (ops.warp.interpn_rows).
    # Measured on v5e at 128^3 it LOSES to the flat 8-gather (274ms vs 133ms
    # at C=1; 976ms vs 104ms at C=3 — full-row fetches waste 126/128 lanes),
    # so 'auto' stays on the gather chain; 'rows' remains for other
    # topologies/backends.
    if (impl == 'rows' and nb_dims == 3
            and vol.ndim in (3, 4) and all(s > 1 for s in vol.shape[:3])):
        from neurite_tpu.ops import warp as warp_ops
        return warp_ops.interpn_rows(vol, loc, interp_method=interp_method,
                                     fill_value=fill_value)

    # impl='onehot' selects the block-windowed one-hot MXU engine — 9.5x the
    # flat gather chain at 128^3 on v5e, exact for fields whose per-axis
    # displacement is bounded by `max_disp` (see ops.warp.interpn_onehot).
    if (impl == 'onehot' and nb_dims == 3 and vol.ndim in (3, 4)):
        from neurite_tpu.ops import warp as warp_ops
        return warp_ops.interpn_onehot(vol, loc, interp_method=interp_method,
                                       fill_value=fill_value,
                                       max_disp=max_disp,
                                       block=block or (8, 8))

    # impl='window' is the UNBOUNDED-exact engine: dynamic per-block windows
    # + runtime spread guard + gather-chain fallback (ops.warp.interpn_window).
    if (impl == 'window' and nb_dims == 3 and vol.ndim in (3, 4, 5)):
        from neurite_tpu.ops import warp as warp_ops
        blk = (None if block is None
               else block if len(block) > 2 else (block[0], block[1], 64))
        return warp_ops.interpn_window(
            vol, loc, interp_method=interp_method, fill_value=fill_value,
            block=blk, window_pad=int(np.ceil(max_disp)) + 1, guard=guard)

    if vol.ndim not in (nb_dims, nb_dims + 1):
        raise ValueError(
            f'Number of loc Tensors {nb_dims} does not match volume dimension '
            f'{vol.ndim - 1}')

    if vol.ndim == nb_dims:
        vol = vol[..., None]

    # float locations, matching volume dtype when the volume is floating
    if not jnp.issubdtype(loc.dtype, jnp.floating):
        target = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32
        loc = loc.astype(target)
    elif jnp.issubdtype(vol.dtype, jnp.floating) and vol.dtype != loc.dtype:
        loc = loc.astype(vol.dtype)

    volshape = vol.shape
    max_loc = [d - 1 for d in volshape[:-1]]
    flat_vol = vol.reshape(-1, volshape[-1])

    if interp_method == 'linear':
        loc0 = jnp.floor(loc)

        clipped_loc = [jnp.clip(loc[..., d], 0, max_loc[d]) for d in range(nb_dims)]
        loc0lst = [jnp.clip(loc0[..., d], 0, max_loc[d]) for d in range(nb_dims)]
        loc1 = [jnp.clip(loc0lst[d] + 1, 0, max_loc[d]) for d in range(nb_dims)]
        locs = [[f.astype(jnp.int32) for f in loc0lst],
                [f.astype(jnp.int32) for f in loc1]]

        # corner weights: bit 0 -> 1 - frac, bit 1 -> frac
        diff_loc1 = [loc1[d] - clipped_loc[d] for d in range(nb_dims)]
        diff_loc0 = [1 - d for d in diff_loc1]
        weights_loc = [diff_loc1, diff_loc0]

        interp_vol = 0
        for c in itertools.product([0, 1], repeat=nb_dims):
            subs = [locs[c[d]][d] for d in range(nb_dims)]
            idx = sub2ind2d(volshape[:-1], subs)
            vol_val = jnp.take(flat_vol, idx, axis=0,
                               indices_are_sorted=False, mode='clip')
            wt = prod_n([weights_loc[c[d]][d] for d in range(nb_dims)])
            interp_vol = interp_vol + wt[..., None] * vol_val

    else:
        assert interp_method == 'nearest', \
            f'method should be linear or nearest, got: {interp_method}'
        roundloc = jnp.round(loc).astype(jnp.int32)
        roundloc = [jnp.clip(roundloc[..., d], 0, max_loc[d]) for d in range(nb_dims)]
        idx = sub2ind2d(volshape[:-1], roundloc)
        interp_vol = jnp.take(flat_vol, idx, axis=0, mode='clip')

    if fill_value is not None:
        out_type = interp_vol.dtype
        below = [loc[..., d] < 0 for d in range(nb_dims)]
        above = [loc[..., d] > max_loc[d] for d in range(nb_dims)]
        out_of_bounds = jnp.any(jnp.stack(below + above, axis=-1), axis=-1,
                                keepdims=True)
        interp_vol = jnp.where(out_of_bounds,
                               jnp.asarray(fill_value, out_type), interp_vol)

    if input_vol_ndim == nb_dims:
        interp_vol = interp_vol[..., 0]

    return interp_vol


def resize(vol, zoom_factor, interp_method='linear', new_shape=None):
    """
    N-D volume resize by `zoom_factor` (scipy-zoom-like), built on interpn.

    If zoom_factor is a list its length sets ndims (vol may have +1 channel dim);
    if scalar, vol must be [*spatial, C]. `new_shape` optionally overrides the
    computed target spatial shape (a TPU-native addition — handy for exact shapes).

    Parity: reference `neurite/tf/utils/utils.py:223-264`.
    """
    if isinstance(zoom_factor, (list, tuple)):
        ndims = len(zoom_factor)
        vol_shape = vol.shape[:ndims]
        assert len(vol_shape) in (ndims, ndims + 1), \
            f'zoom_factor length {len(vol_shape)} does not match ndims {ndims}'
    else:
        vol_shape = vol.shape[:-1]
        ndims = len(vol_shape)
        zoom_factor = [zoom_factor] * ndims

    if new_shape is None:
        if all(z == 1 for z in zoom_factor):
            return vol
        new_shape = [int(vol_shape[d] * zoom_factor[d]) for d in range(ndims)]

    # a zoom grid is axis-separable, so the 2^N-corner interpn gather chain
    # factorizes into N 1-D passes (contiguous takes / MXU matmuls) — the
    # TPU-native replacement for the reference's scattered gathers.
    # Identical numerics to interpn on the equivalent ndgrid (parity-tested).
    from neurite_tpu.ops import resize_mm
    return resize_mm.resize_separable(vol, tuple(int(s) for s in new_shape),
                                      method=interp_method)


zoom = resize


###############################################################################
# volumetric / axis operations
###############################################################################

def map_fn_axis(fn, elems, axis, **kwargs):
    """
    Apply `fn` mapped along a specific axis of `elems` (tensor or list of
    tensors, with per-element axes when a list).

    Parity: reference `neurite/tf/utils/utils.py:272-330` (tf.map_fn + permutes).
    TPU-native: this is exactly `jax.vmap` with in/out axes — vectorized, not a
    serial loop.
    """
    kwargs.pop('fn_output_signature', None)  # TF-ism; irrelevant under vmap

    def _restore(y, ax):
        # mirror the reference permute: move the mapped axis (vmap puts it at 0)
        # back to position `ax`, clamped to the output rank (rank-reducing fns)
        if ax < 0:
            ax = y.ndim - 1
        return jnp.moveaxis(y, 0, min(ax, y.ndim - 1))

    islist = isinstance(elems, (tuple, list))
    if not islist:
        assert not isinstance(axis, (tuple, list)), \
            'axis cannot be list if elements are not list'
        mapped = jax.vmap(fn, in_axes=axis, out_axes=0)(elems)
        out_is_list = isinstance(mapped, (tuple, list))
        if out_is_list:
            ax = [axis] * len(mapped)
            return [_restore(y, a) for y, a in zip(mapped, ax)]
        return _restore(mapped, axis)
    else:
        if not isinstance(axis, (tuple, list)):
            axis = [axis] * len(elems)
        wrapped = lambda args: fn(args)
        mapped = jax.vmap(wrapped, in_axes=(tuple(axis),), out_axes=0)(
            tuple(elems))
        out_is_list = isinstance(mapped, (tuple, list))
        if out_is_list:
            return [_restore(y, a) for y, a in zip(mapped, axis)]
        return _restore(mapped, axis[0])


def volshape_to_ndgrid(volshape, dtype=jnp.int32):
    """ndgrid ('ij') of ranges over a volume shape (ref `utils.py:333-351`)."""
    isint = [float(d).is_integer() for d in volshape]
    if not all(isint):
        raise ValueError('volshape needs to be a list of integers')
    linvec = [jnp.arange(0, d, dtype=dtype) for d in volshape]
    return ndgrid(*linvec)


def volshape_to_meshgrid(volshape, dtype=jnp.int32):
    """meshgrid ('xy') of ranges over a volume shape (ref `utils.py:354-375`)."""
    isint = [float(d).is_integer() for d in volshape]
    if not all(isint):
        raise ValueError('volshape needs to be a list of integers')
    linvec = [jnp.arange(0, d, dtype=dtype) for d in volshape]
    return meshgrid(*linvec)


def ndgrid(*args):
    """N-D grid with 'ij' indexing (ref `utils.py:378-391`)."""
    return meshgrid(*args, indexing='ij')


def meshgrid(*args, indexing='xy'):
    """
    Broadcast 1-D tensors onto an N-D grid.

    Parity: reference `neurite/tf/utils/utils.py:394-476`. The reference replaces
    tf.meshgrid's broadcast-by-multiply with tf.tile for a "~6x speedup"
    (`utils.py:466-471`); under XLA the broadcast is free (fused into consumers),
    so we simply use jnp.meshgrid — same outputs, no materialization at all.
    """
    if indexing not in ('xy', 'ij'):
        raise ValueError("indexing parameter must be either 'xy' or 'ij'")
    return list(jnp.meshgrid(*args, indexing=indexing))


def flatten(v):
    """Flatten to 1-D (ref `utils.py:479-490`)."""
    return jnp.reshape(v, [-1])


def take(x, indices, axis):
    """np.take-like gather along an axis (ref `utils.py:493-509`)."""
    if isinstance(indices, (list, tuple)):
        indices = jnp.asarray(indices)
    return jnp.take(x, indices, axis=axis)


def barycenter(x, axes=None, normalize=False, shift_center=False,
               dtype=jnp.float32):
    """
    Center of mass of `x` along `axes` (None = all), optionally with the
    coordinate grid normalized to unit length or shifted to the image center.

    Parity: reference `neurite/tf/utils/utils.py:512-573` (SynthMorph).
    """
    compute_type = jnp.float32
    x = jnp.asarray(x, compute_type)

    axes_all = range(x.ndim)
    if axes is None:
        axes = tuple(axes_all)
    axes_sub = tuple(ax for ax in axes_all if ax not in axes)
    if axes_sub:
        x = jnp.transpose(x, axes=(*axes_sub, *axes))

    num_dim = len(axes)
    vol_shape = x.shape[-num_dim:]

    grid = (np.arange(f, dtype=np.float32) for f in vol_shape)
    if shift_center:
        grid = (g - (v - 1) / 2 for g, v in zip(grid, vol_shape))
    if normalize:
        grid = (g / v for g, v in zip(grid, vol_shape))
    grid = np.meshgrid(*grid, indexing='ij')
    grid = np.stack(grid, axis=-1)

    axes_red = tuple(axes_all)[-num_dim:]
    x = x[..., None]
    num = jnp.sum(grid * x, axis=axes_red)
    den = jnp.sum(x, axis=axes_red)
    out = jnp.where(den == 0, 0., num / jnp.where(den == 0, 1., den))
    return out.astype(dtype)


###############################################################################
# filtering
###############################################################################

def gaussian_kernel(sigma, windowsize=None, indexing='ij', separate=False,
                    random=False, min_sigma=0, dtype=jnp.float32, seed=None):
    """
    N-D Gaussian kernel (or a list of separated 1-D kernels).

    When `random=True`, each axis' sigma is drawn uniformly from
    [min_sigma, sigma); the window size stays static (computed from the max
    sigma) so the result is jit-friendly — identical semantics to the reference,
    where the window is also sized from the nominal sigma
    (`neurite/tf/utils/utils.py:633`).

    Parity: reference `neurite/tf/utils/utils.py:581-662`.
    """
    assert jnp.issubdtype(dtype, jnp.floating), f'{dtype} is not floating-point'

    if not isinstance(sigma, (list, tuple)):
        sigma = [sigma]
    if not isinstance(min_sigma, (list, tuple)):
        min_sigma = [min_sigma] * len(sigma)
    eps = float(jnp.finfo(dtype).eps)
    is_static_sigma = all(isinstance(s, (int, float, np.floating, np.integer))
                          for s in sigma)
    if is_static_sigma:
        sigma = [max(f, eps) for f in sigma]
    min_sigma = [max(float(f), eps) for f in min_sigma]

    if windowsize is None:
        assert is_static_sigma, \
            'windowsize must be given when sigma is a traced value'
        windowsize = [int(np.round(f * 3) * 2 + 1) for f in sigma]
    if not isinstance(windowsize, (list, tuple)):
        windowsize = [windowsize]
    if len(sigma) != len(windowsize):
        raise ValueError(f'sigma {sigma} and width {windowsize} differ in length')

    # precompute -x^2/2 grids (static shapes)
    center = [(w - 1) / 2 for w in windowsize]
    mesh = [np.arange(w) - c for w, c in zip(windowsize, center)]
    mesh = [-0.5 * x**2 for x in mesh]
    if not separate:
        mesh = np.meshgrid(*mesh, indexing=indexing)
    mesh = [jnp.asarray(m, dtype=dtype) for m in mesh]

    if random:
        key = as_key(seed)
        keys = jax.random.split(key, len(sigma))
        sigma = [jax.random.uniform(k, (), dtype=dtype, minval=a, maxval=b)
                 for k, a, b in zip(keys, min_sigma, sigma)]

    exponent = [m / (jnp.asarray(s, dtype) ** 2) for m, s in zip(mesh, sigma)]

    if not separate:
        exponent = [sum(exponent)]
    kernel = [jnp.exp(x) for x in exponent]
    kernel = [x / jnp.sum(x) for x in kernel]

    return kernel if len(kernel) > 1 else kernel[0]


def separable_conv(x, kernels, axis=None, batched=False, padding='SAME',
                   strides=None, dilations=None):
    """
    Apply 1-D kernels along chosen spatial axes of a [*spatial, C] (or
    [B, *spatial, C] when batched) tensor; the same filters apply to every
    feature.

    Parity: reference `neurite/tf/utils/utils.py:665-752`. Same merge-batch×
    channel-then-1D-convolve strategy, expressed as
    `lax.conv_general_dilated` per axis — XLA maps each pass onto the MXU/VPU
    and fuses the transposes.
    """
    if not batched:
        x = x[None]
    num_dim = x.ndim - 2

    if np.isscalar(axis):
        axis = [axis]
    axes_space = range(num_dim)
    if axis is None:
        axis = list(axes_space)
    assert all(ax in axes_space for ax in axis), 'non-spatial axis passed'

    ones = np.ones(num_dim, np.int32)

    def _conform(v):
        v = [1] if v is None else list(np.ravel(v))
        if len(v) == 1:
            v = v * len(axis)
        return v
    strides = _conform(strides)
    dilations = _conform(dilations)
    assert len(strides) == len(axis), 'number of strides and axes differ'
    assert len(dilations) == len(axis), 'number of dilations and axes differ'

    if not isinstance(kernels, (tuple, list)):
        kernels = [kernels]
    if len(kernels) == 1:
        kernels = list(kernels) * len(axis)
    assert len(kernels) == len(axis), 'number of kernels and axes differ'

    # merge batch and features: [B, *space, C] -> [B*C, *space, 1]
    shape_space = x.shape[1:-1]
    ind = np.arange(num_dim + 2)
    forward = (0, ind[-1], *ind[1:-1])
    backward = (0, *ind[2:], 1)
    x = jnp.transpose(x, forward)
    shape_bc = x.shape[:2]
    x = x.reshape((shape_bc[0] * shape_bc[1], *shape_space, 1))

    # fused one-pass Pallas kernel for the 3-D SAME/stride-1 case (every
    # Gaussian-blur path): one HBM round trip for all three axes instead of
    # one per axis — see ops/blur.py. Standalone it measures 4.2x the XLA
    # passes at 128^3 (benchmarks/blur.py) AND is f32-exact where the XLA
    # conv path accumulates in bf16 — but embedded in a large program it
    # was measured to DESYNC the XLA scheduler (synthesis step 204->375ms),
    # so implicit routing is opt-in via NEURITE_FUSED_BLUR=1; call
    # ops.separable_blur3d directly for isolated/precision-critical blurs.
    if (num_dim == 3 and padding == 'SAME'
            and os.environ.get('NEURITE_FUSED_BLUR')
            and len(set(axis)) == len(axis)
            and all(int(s) == 1 for s in strides)
            and all(int(d) == 1 for d in dilations)):
        from neurite_tpu.ops import blur as blur_ops
        ks3 = [jnp.ones((1,), x.dtype)] * 3
        for ax, k in zip(axis, kernels):
            ks3[ax] = jnp.asarray(k, x.dtype).reshape(-1)
        xs = x.shape
        from neurite_tpu import backend
        if (blur_ops.supported((xs[0], *shape_space),
                               [k.shape[-1] for k in ks3], x.dtype)
                and blur_ops.profitable((xs[0], *shape_space))
                and backend.is_tpu()):
            out = blur_ops.separable_blur3d(
                x.reshape(xs[0], *shape_space), ks3, impl='pallas')
            out = out.reshape((*shape_bc, *shape_space))
            out = jnp.transpose(out, backward)
            return out if batched else out[0]

    # each axis pass runs as either a banded [L, L] MXU matmul (SAME/stride-1
    # axes up to _MM_MAX_LEN — ops/conv_mm.py; a 1-channel conv wastes
    # 127/128 MXU lanes, measured 16.5 -> 0.8ms for the synthesis bias blur
    # at window 165, AND f32-exact where the conv path accumulates in bf16)
    # or a reshape-only 2-D conv [pre, ax, post, 1] with kernel (k, 1):
    # XLA's TPU conv2d path is far faster than N-D convs with (1,..,k,..,1)
    # kernels (the conv3d slow path — see ops/zdecomp.py), and the reshapes
    # are contiguous views, no transposes.
    del ones
    from neurite_tpu.ops.conv_mm import _MM_MAX_LEN, conv1d_mm
    dn2 = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ('NHWC', 'HWIO', 'NHWC'))

    for ax, k, s, d in zip(axis, kernels, strides, dilations):
        k = jnp.asarray(k, x.dtype)
        width = int(np.prod(k.shape))
        space = x.shape[1:-1]
        pre = int(np.prod((x.shape[0],) + tuple(space[:ax])))
        post = int(np.prod(space[ax + 1:]))
        xr = x.reshape(pre, space[ax], post, 1)
        if (str(padding).upper() == 'SAME' and int(s) == 1 and int(d) == 1
                and space[ax] <= _MM_MAX_LEN):
            out = conv1d_mm(xr, k)
        else:
            out = jax.lax.conv_general_dilated(
                xr, k.reshape(width, 1, 1, 1),
                window_strides=(int(s), 1), padding=padding,
                rhs_dilation=(int(d), 1), dimension_numbers=dn2)
        new_ax = out.shape[1]
        x = out.reshape((x.shape[0], *space[:ax], new_ax, *space[ax + 1:], 1))

    x = x.reshape((*shape_bc, *x.shape[1:-1]))
    x = jnp.transpose(x, backward)
    return x if batched else x[0]


def subsample_axis(x, stride_min=1, stride_max=8, axes=None, prob=1,
                   upsample=True, seed=None):
    """
    Randomly subsample `x` along one randomly drawn axis by a random factor in
    [stride_min, stride_max) with nearest-neighbor resampling, optionally
    upsampling back — thick-slice simulation.

    Parity: reference `neurite/tf/utils/utils.py:754-826`. TPU-native twist: with
    `upsample=True` (the training-path default), the down- and up-sampling
    gathers are composed into ONE static-shape gather so the op is jittable
    despite the dynamic intermediate slice count.
    """
    x = jnp.asarray(x)
    key = as_key(seed)
    k_ax, k_thick, k_prob = jax.random.split(key, 3)

    num_dim = x.ndim
    if axes is None:
        axes = list(range(num_dim))
    if np.isscalar(axes):
        axes = [axes]
    assert all(i in range(num_dim) for i in axes), 'invalid axis passed'
    assert 0 < stride_min <= stride_max, 'invalid strides'
    assert 0 <= prob <= 1, f'{prob} not a probability'

    ind = jax.random.randint(k_ax, (), 0, len(axes))
    thick = jax.random.uniform(k_thick, (), minval=float(stride_min),
                               maxval=float(stride_max))
    if prob < 1:
        rand_bit = jax.random.uniform(k_prob, ()) < prob
        thick = jnp.where(rand_bit, thick, 1.0)

    def _composed_indices(width):
        # reference downsample: num_slice = int(width/thick + 0.5);
        # d_j = int(linspace(0, width-1, num_slice)[j] + 0.5)
        # reference upsample:   u_i = int(linspace(0, num_slice-1, width)[i] + 0.5)
        # composed: idx_i = d[u_i]; all shapes static in `width`.
        num_slice = jnp.floor(width / thick + 0.5).astype(jnp.int32)
        i = jnp.arange(width, dtype=jnp.float32)
        # linspace(0, n-1, width)[i] = i*(n-1)/(width-1)
        denom_up = jnp.maximum(width - 1, 1)
        u = jnp.floor(i * (num_slice - 1) / denom_up + 0.5)
        denom_dn = jnp.maximum(num_slice - 1, 1).astype(jnp.float32)
        d_of_u = jnp.floor(u * (width - 1) / denom_dn + 0.5).astype(jnp.int32)
        return d_of_u

    if upsample:
        # branchless over the axis choice (static unroll over candidate axes)
        def apply_axis(xi, ax):
            width = x.shape[ax]
            idx = _composed_indices(width)
            return jnp.take(xi, idx, axis=ax)
        branches = [lambda xi, ax=ax: apply_axis(xi, ax) for ax in axes]
        if len(branches) == 1:
            return branches[0](x)
        return jax.lax.switch(ind, branches, x)

    # upsample=False changes the output shape -> only valid with concrete values
    thick_c = float(jax.device_get(thick))
    ax = axes[int(jax.device_get(ind))]
    width = x.shape[ax]
    num_slice = int(width / thick_c + 0.5)
    idx = np.floor(np.linspace(0., width - 1., num_slice) + 0.5).astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=ax)


###############################################################################
# simple math functions, often used as activations
###############################################################################

def softmax(x, axis=-1, alpha=1):
    """Softmax with a temperature-like alpha multiplier (ref `utils.py:833-857`)."""
    x = alpha * x
    e = jnp.exp(x - jnp.max(x, axis=axis, keepdims=True))
    return e / jnp.sum(e, axis=axis, keepdims=True)


def logtanh(x, a=1):
    """tanh(x) * log(2 + a|x|) (ref `utils.py:860-866`)."""
    return jnp.tanh(x) * jnp.log(2 + a * jnp.abs(x))


def arcsinh(x, alpha=1):
    """asinh(alpha*x)/alpha (ref `utils.py:869-875`)."""
    return jnp.arcsinh(x * alpha) / alpha


def logistic(x, x0=0., alpha=1., L=1.):
    """L / (1 + exp(-alpha*(x-x0))) (ref `utils.py:878-886`)."""
    assert L > 0, 'L (height of logistic) should be > 0'
    assert alpha > 0, 'alpha (slope) of logistic should be > 0'
    return L / (1 + jnp.exp(-alpha * (x - x0)))


def sigmoid(x):
    """Standard sigmoid (ref `utils.py:889-890`)."""
    return logistic(x, x0=0., alpha=1., L=1.)


def logistic_fixed_ends(x, start=-1., end=1., L=1., **kwargs):
    """Logistic linearly corrected so f(start)=0 and f(end)=L (ref `utils.py:893-916`)."""
    assert end > start, 'End of fixed points should be greater than start'
    x = jnp.clip(x, start, end)
    xv = logistic(x, L=L, **kwargs)
    sv = logistic(start, L=L, **kwargs)
    ev = logistic(end, L=L, **kwargs)
    df = end - start
    linear_corr = (end - x) / df * (-sv) + (x - start) / df * (-ev + L)
    return xv + linear_corr


def sigmoid_fixed_ends(x, start=-1., end=1., L=1., **kwargs):
    """Sigmoid with fixed ends (ref `utils.py:919-920`; note the reference also
    ignores its start/end/L arguments and fixes them to (-1, 1, 1))."""
    return logistic_fixed_ends(x, start=-1., end=1., L=1., x0=0., alpha=1.)


def soft_round(x, alpha=25):
    """Differentiable rounding (ref `utils.py:923-926`)."""
    fx = jnp.floor(x)
    xd = x - fx
    return fx + logistic_fixed_ends(xd, start=0., end=1., x0=0.5, alpha=alpha)


def soft_delta(x, x0=0., alpha=100, reg='l1'):
    """Soft delta bump around x0 (ref `utils.py:929-941`)."""
    if reg == 'l1':
        xa = jnp.abs(x - x0)
    else:
        assert reg == 'l2'
        xa = jnp.square(x - x0)
    return (1 - logistic(xa, alpha=alpha)) * 2


def odd_shifted_relu(x, shift=-0.5, scale=2.0):
    """Odd-symmetric shifted ReLU (ref `utils.py:944-951`)."""
    shift = float(shift)
    scale = float(scale)
    return scale * jax.nn.relu(x - shift) - scale * jax.nn.relu(-x - shift)


def minmax_norm(x, axis=None):
    """Safe min-max normalization (ref `utils.py:953-967`)."""
    x_min = jnp.min(x, axis=axis, keepdims=True)
    x_max = jnp.max(x, axis=axis, keepdims=True)
    den = x_max - x_min
    return jnp.where(den == 0, 0., (x - x_min) / jnp.where(den == 0, 1., den))


def whiten(x, mean=0., std=1.):
    """Whiten to given mean/std (ref `utils.py:970-984`)."""
    x = x - jnp.mean(x)
    return x / jnp.std(x) * std + mean


###############################################################################
# other
###############################################################################

def perlin_vol(vol_shape, min_scale=0, max_scale=None, interp_method='linear',
               wt_type='monotonic', seed=None):
    """
    Legacy multi-scale uniform-noise "Perlin" volume: sum of upsampled random
    volumes at dyadic scales with monotonic or random weights.

    Parity: reference `neurite/tf/utils/utils.py:991-1065`; kept for parity —
    prefer `neurite_tpu.utils.augment.draw_perlin_full` for new code.
    """
    assert wt_type in ('monotonic', 'random'), \
        f"wt_type should be in 'monotonic', 'random', got: {wt_type}"
    key = as_key(seed)

    if max_scale is None:
        max_width = np.max(vol_shape)
        max_scale = int(np.ceil(np.log2(max_width)))

    scale_shapes = []
    wts = []
    n_scales = max_scale + 1 - min_scale
    keys = jax.random.split(key, n_scales + 1)
    for j, i in enumerate(range(min_scale, max_scale + 1)):
        scale_shapes.append(
            np.ceil([f / (2 ** i) for f in vol_shape]).astype('int'))
        if wt_type == 'monotonic':
            wts.append(jnp.asarray(float(i + 1)))
        else:
            wts.append(jax.random.uniform(keys[j], ()))

    wts = jnp.stack(wts)
    wts = (wts / jnp.sum(wts)).astype(jnp.float32)

    vol = 0
    for sci, sc in enumerate(scale_shapes):
        rand_vol = jax.random.uniform(keys[n_scales], tuple(int(s) for s in sc))
        interp_vol = resize(rand_vol, [vol_shape[d] / sc[d]
                                       for d in range(len(vol_shape))],
                            interp_method=interp_method,
                            new_shape=list(vol_shape))
        vol = vol + wts[sci] * interp_vol
    return vol


def sub2ind2d(siz, subs):
    """
    Row-major linear index from per-dimension subscripts (a list of equal-shape
    index arrays). Parity: reference `neurite/tf/utils/utils.py:1068-1082`.
    """
    assert len(siz) == len(subs), \
        f'found inconsistent siz and subs: {len(siz)} {len(subs)}'
    k = np.cumprod(siz[::-1])
    ndx = subs[-1]
    for i, v in enumerate(subs[:-1][::-1]):
        ndx = ndx + v * int(k[i])
    return ndx


def prod_n(lst):
    """Fold-multiply a list of tensors (ref `utils.py:1085-1092`)."""
    prod = lst[0]
    for p in lst[1:]:
        prod = prod * p
    return prod


def soft_quantize(x, bin_centers=None, nb_bins=16, alpha=1, min_clip=-np.inf,
                  max_clip=np.inf, return_log=False):
    """
    Softly quantize (digitize) intensities via RBF bin assignment: each value v
    contributes exp(-alpha * (v - c)^2) to the bin centered at c. Returns
    [..., B]. Bin centers default to linspace(min(x), max(x), nb_bins).

    Parity: reference `neurite/tf/utils/utils.py:1095-1172`. On TPU this fuses
    into downstream MI reductions (see `neurite_tpu.metrics.MutualInformation`).
    """
    x = jnp.asarray(x, jnp.float32)
    if bin_centers is not None:
        bin_centers = jnp.asarray(bin_centers, jnp.float32)
        assert nb_bins is None, 'cannot provide both bin_centers and nb_bins'
        nb_bins = bin_centers.shape[0]
    else:
        if nb_bins is None:
            nb_bins = 16
        minval = jnp.min(x)
        maxval = jnp.max(x)
        bin_centers = jnp.linspace(minval, maxval, nb_bins)

    x = jnp.clip(x[..., None], min_clip, max_clip)
    new_shape = [1] * (x.ndim - 1) + [nb_bins]
    bin_centers = jnp.reshape(bin_centers, new_shape)

    bin_diff = jnp.square(x - bin_centers)
    log = -alpha * bin_diff
    return log if return_log else jnp.exp(log)


soft_digitize = soft_quantize


def batch_channel_flatten(x):
    """[B, ..., C] -> [B, V, C] (ref `utils.py:1175-1189`)."""
    return flatten_axes(x, range(1, jnp.ndim(x) - 1))


flatten_batch_channel = batch_channel_flatten


def flatten_axes(x, axes):
    """Flatten contiguous `axes` of x into one (ref `utils.py:1195-1226`)."""
    assert isinstance(axes, (list, tuple, range)), \
        'axes must be list or tuple of axes to be flattened'
    axes = list(axes)
    assert np.all(np.diff(axes) == 1), 'axes need to be contiguous'
    if axes[0] < 0:
        assert axes[-1] < 0, 'if one axis is negative, all have to be negative'
        axes = [ax + x.ndim for ax in axes]
    assert axes[-1] < x.ndim, f'axis {axes[-1]} outside max axis {x.ndim - 1}'

    shp = x.shape
    new_shape = (*shp[:axes[0]], -1, *shp[axes[-1] + 1:])
    return jnp.reshape(x, new_shape)


def fftn(x, axes=None, inverse=False):
    """
    FFT along any axes; real inputs are promoted to complex64.

    Parity: reference `neurite/tf/utils/utils.py:1229-1272` (transpose+1D-fft
    loop). TPU-native: one `jnp.fft.fftn` call — XLA's FFT handles arbitrary
    axes directly.
    """
    axes = normalize_axes(axes, jnp.shape(x), none_means_all=True)
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(jnp.complex64)
    fft = jnp.fft.ifftn if inverse else jnp.fft.fftn
    return fft(x, axes=axes)


def ifftn(x, axes=None):
    """Inverse FFT along any axes (ref `utils.py:1275-1277`)."""
    return fftn(x, axes, inverse=True)


fftshift = jnp.fft.fftshift
ifftshift = jnp.fft.ifftshift


def complex_to_channels(x):
    """Complex [..., N] -> real [..., 2N] (real then imag) (ref `utils.py:1285-1306`)."""
    assert jnp.issubdtype(x.dtype, jnp.complexfloating), 'non-complex input passed'
    return jnp.concatenate((jnp.real(x), jnp.imag(x)), axis=-1)


def channels_to_complex(x):
    """Real [..., 2N] -> complex [..., N] (ref `utils.py:1309-1341`)."""
    x = jnp.asarray(x)
    assert not jnp.issubdtype(x.dtype, jnp.complexfloating), 'complex input passed'
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    real, imag = jnp.split(x, 2, axis=-1)
    return jax.lax.complex(real, imag)


def batch_gather(reference, indices):
    """
    Per-batch-row gather: out[b] = reference[b, indices[b]].

    Parity: reference `neurite/tf/utils/utils.py:1348-1379`.
    """
    indices = jnp.asarray(indices)
    return jax.vmap(lambda r, i: r[i])(reference, indices)


def space_to_depth(x, block=2, batched=True):
    """
    Fold `block`-sized spatial tiles into channels:
    [B, *spatial, C] -> [B, *spatial/block, C*block^N].

    TPU-native addition (no reference counterpart): 3-D convs with few
    channels waste the 128-lane vector width; folding space into channels
    fills the lanes (see docs/DESIGN.md).
    """
    x = jnp.asarray(x)
    nd = x.ndim - 1 - int(batched)
    lead = 1 if batched else 0
    shape = x.shape
    for d in range(nd):
        assert shape[lead + d] % block == 0, \
            f'spatial dim {shape[lead + d]} not divisible by block {block}'
    # split each spatial dim, then move all block factors next to channels
    split = ([shape[0]] if batched else [])
    for d in range(nd):
        split += [shape[lead + d] // block, block]
    split += [shape[-1]]
    x = x.reshape(split)
    # axes: [B] + [s0, b0, s1, b1, ...] + [C] -> [B] + [s...] + [b..., C]
    perm = ([0] if batched else [])
    perm += [lead + 2 * d for d in range(nd)]
    perm += [lead + 2 * d + 1 for d in range(nd)]
    perm += [x.ndim - 1]
    x = jnp.transpose(x, perm)
    out_spatial = [shape[lead + d] // block for d in range(nd)]
    lead_shape = [shape[0]] if batched else []
    return x.reshape(lead_shape + out_spatial + [shape[-1] * block ** nd])


def depth_to_space(x, block=2, batched=True):
    """Inverse of `space_to_depth`."""
    x = jnp.asarray(x)
    nd = x.ndim - 1 - int(batched)
    lead = 1 if batched else 0
    shape = x.shape
    c_out = shape[-1] // block ** nd
    assert shape[-1] == c_out * block ** nd, \
        f'channels {shape[-1]} not divisible by block^{nd}'
    split = ([shape[0]] if batched else [])
    split += [shape[lead + d] for d in range(nd)]
    split += [block] * nd + [c_out]
    x = x.reshape(split)
    perm = ([0] if batched else [])
    for d in range(nd):
        perm += [lead + d, lead + nd + d]
    perm += [x.ndim - 1]
    x = jnp.transpose(x, perm)
    lead_shape = [shape[0]] if batched else []
    out_spatial = [shape[lead + d] * block for d in range(nd)]
    return x.reshape(lead_shape + out_spatial + [c_out])
