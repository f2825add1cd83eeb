"""
Randomized augmentation ops.

Capability parity with reference `neurite/tf/utils/augment.py` (file:line cites on
each function), re-designed TPU-first: explicit `jax.random` keys, static shapes,
fully jit-able (randomized axis choices use `lax.switch` / masked broadcasting
instead of dynamic shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.py.utils import normalize_axes
from neurite_tpu.utils import core
from neurite_tpu.utils.core import as_key

__all__ = ['draw_perlin', 'random_blur_rescale', 'draw_perlin_full',
           'draw_crop_mask']


def draw_perlin(out_shape, scales, min_std=0, max_std=1, dtype=jnp.float32,
                seed=None):
    """
    Perlin-style noise: normal noise drawn at each `scale` (relative
    resolution), upsampled to `out_shape` and summed. The per-scale SD is drawn
    uniformly from [min_std, max_std).

    `out_shape` has N+1 elements (trailing features).

    Parity: reference `neurite/tf/utils/augment.py:7-62`.
    """
    out_shape = np.asarray(out_shape, dtype=np.int32)
    if np.isscalar(scales):
        scales = [scales]
    key = as_key(seed)

    out = jnp.zeros(tuple(int(s) for s in out_shape), dtype=dtype)
    for scale in scales:
        key, k_std, k_noise = jax.random.split(key, 3)
        sample_shape = np.ceil(out_shape[:-1] / scale)
        sample_shape = np.int32((*sample_shape, out_shape[-1]))

        std = jax.random.uniform(k_std, (), dtype=dtype, minval=min_std,
                                 maxval=max_std)
        gauss = std * jax.random.normal(k_noise, tuple(int(s) for s in sample_shape),
                                        dtype=dtype)

        if scale == 1:
            out = out + gauss
        else:
            out = out + core.resize(gauss,
                                    [int(o) / int(s) for o, s in
                                     zip(out_shape[:-1], sample_shape[:-1])],
                                    new_shape=[int(s) for s in out_shape[:-1]])
    return out


def random_blur_rescale(x, std_min=8 / 2.355, std_max=32 / 2.355,
                        isotropic=False, seed=None, reduce=jnp.std,
                        batched=False):
    """
    Random separable Gaussian blur of the spatial axes, rescaled so a global
    statistic (`reduce`, default SD) is preserved.

    Parity: reference `neurite/tf/utils/augment.py:65-112`.
    """
    key = as_key(seed)
    n_dim = len(x.shape[int(batched):-1])

    keys = jax.random.split(key, n_dim)
    kernel = [core.gaussian_kernel(sigma=std_max, separate=True, random=True,
                                   min_sigma=std_min, dtype=x.dtype, seed=k)
              for k in keys]
    # gaussian_kernel returns a single kernel for a 1-element list
    kernel = [k[0] if isinstance(k, list) else k for k in kernel]
    if isotropic:
        kernel = kernel[:1] * n_dim

    before = reduce(x)
    x = core.separable_conv(x, kernel, batched=batched)
    after = reduce(x)
    scale = jnp.where(after == 0, 0., before / jnp.where(after == 0, 1., after))
    return x * scale


def draw_perlin_full(shape, noise_min=0.01, noise_max=1, fwhm_min=4,
                     fwhm_max=32, isotropic=False, batched=False,
                     featured=False, reduce=jnp.std, dtype=jnp.float32,
                     axes=None, seed=None):
    """
    Modern Perlin noise without interpolation: at each level, draw full-res
    normal noise with a random SD (optionally a separate SD along `axes`),
    blur with a random-FWHM Gaussian (preserving a global statistic), then
    average over levels.

    Parity: reference `neurite/tf/utils/augment.py:115-218`.
    """
    assert 0 < noise_min <= noise_max, \
        f'invalid noise-SD bounds {(noise_min, noise_max)}'
    key = as_key(seed)

    axes = normalize_axes(axes, shape, none_means_all=False)
    shape = list(shape)
    if not batched:
        shape = [1] + shape
        axes = [ax + 1 for ax in axes]
    if not featured:
        shape = shape + [1]
    shape = tuple(int(s) for s in shape)

    shape_sd = tuple(shape[i] if i in axes else 1 for i in range(len(shape)))

    if not hasattr(fwhm_min, '__iter__'):
        fwhm_min = [fwhm_min]
    if not hasattr(fwhm_max, '__iter__'):
        fwhm_max = [fwhm_max]
    assert len(fwhm_min) == len(fwhm_max), \
        'different number of lower and upper bounds'

    out = []
    for low, upp in zip(fwhm_min, fwhm_max):
        key, k_sd, k_noise, k_blur = jax.random.split(key, 4)
        noise_sd = jax.random.uniform(k_sd, shape_sd, dtype=dtype,
                                      minval=noise_min, maxval=noise_max)
        noise = noise_sd * jax.random.normal(k_noise, shape, dtype=dtype)
        noise = random_blur_rescale(noise, std_min=low / 2.355,
                                    std_max=upp / 2.355, batched=True,
                                    isotropic=isotropic, seed=k_blur,
                                    reduce=reduce)
        out.append(noise)

    out = jnp.mean(jnp.stack(out), axis=0)
    if not batched:
        out = out[0, ...]
    if not featured:
        out = out[..., 0]
    return out


def draw_crop_mask(x, crop_min=0, crop_max=0.5, axis=None, prob=1,
                   bilateral=False, seed=None):
    """
    Draw a binary field-of-view crop mask along one (randomly drawn) axis:
    a proportion in [crop_min, crop_max) of the axis is zeroed, from one end
    (or split between both ends when `bilateral`), gated by `prob`.

    Parity: reference `neurite/tf/utils/augment.py:221-287`. TPU-native twist:
    instead of returning a dynamically-shaped [1,..,W,..,1] mask (the axis is a
    runtime draw), we return a broadcast-compatible mask spanning the candidate
    axes, with non-selected axes all-ones — XLA fuses it into the consumer
    multiply, so nothing larger is ever materialized.
    """
    key = as_key(seed)
    k_cut, k_prob, k_prop, k_axis = jax.random.split(key, 4)

    x = jnp.asarray(x)
    axis = normalize_axes(axis, x.shape, none_means_all=True)
    assert 0 <= crop_min <= crop_max <= 1, \
        f'invalid proportions {crop_min}, {crop_max}'

    prop_cut = jnp.asarray(crop_max, jnp.float32)
    if crop_min < crop_max:
        prop_cut = jax.random.uniform(k_cut, (), minval=crop_min,
                                      maxval=crop_max)

    assert 0 <= prob <= 1, f'{prob} not a probability'
    if prob < 1:
        rand_bit = jax.random.uniform(k_prob, ()) < prob
        prop_cut = prop_cut * rand_bit.astype(prop_cut.dtype)

    rand_prop = jax.random.uniform(k_prop, ())
    if not bilateral:
        rand_prop = (rand_prop < 0.5).astype(prop_cut.dtype)
    prop_low = prop_cut * rand_prop
    prop_cen = 1 - prop_cut

    ind = jax.random.randint(k_axis, (), 0, len(axis))

    mask = jnp.ones((), x.dtype)
    for i, ax in enumerate(axis):
        width = x.shape[ax]
        prop = jnp.arange(width, dtype=jnp.float32) / width
        m = jnp.logical_and(prop >= prop_low, prop < prop_low + prop_cen)
        m = jnp.where(ind == i, m.astype(x.dtype), jnp.ones(width, x.dtype))
        bshape = [1] * x.ndim
        bshape[ax] = width
        mask = mask * m.reshape(bshape)
    return mask
