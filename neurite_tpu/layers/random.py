"""
Randomized augmentation and stochastic-sampling layers.

Capability parity with reference `neurite/tf/layers.py` (cites per class),
re-designed TPU-first: randomness comes from flax RNG streams (`make_rng
('augment')` / `make_rng('sample')`) or an explicitly passed `key`, so every
layer is reproducible with fixed keys (replacing the reference's `seed` ints
and hidden `tf.random.Generator` state, `layers.py:2364-2366`).
"""

import warnings
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.py.utils import normalize_axes
from neurite_tpu.utils import augment as aug
from neurite_tpu.utils import core

AUG_RNG = 'augment'
SAMPLE_RNG = 'sample'


class _RandomLayer(nn.Module):
    """Shared helper to resolve a PRNG key (explicit arg wins)."""

    def _key(self, key, stream=AUG_RNG):
        if key is not None:
            return core.as_key(key)
        return self.make_rng(stream)


class GaussianBlur(_RandomLayer):
    """
    Blur with a (possibly random, possibly anisotropic) Gaussian kernel.

    Parity: reference `layers.py:251-364`. Note the reference's deprecated
    `level` path is broken there (self.sigma is unconditionally overwritten,
    `layers.py:305-310`); here `level` works as documented: sigma=(level-1)**2.
    """
    sigma: Optional[Any] = None
    level: Optional[float] = None
    random: bool = False
    min_sigma: Any = 0
    isotropic: bool = False

    def _normalize_sigma(self, sigma, ndims):
        sigma = list(np.ravel(sigma))
        if len(sigma) not in (1, ndims):
            raise ValueError(
                f'1 or {ndims} sigmas expected in {ndims}D space, got {len(sigma)}')
        if any(s < 0 for s in sigma):
            raise ValueError('Gaussian blur sigma must not be less than 0')
        if len(sigma) > 1 and self.isotropic:
            raise ValueError(
                f'random isotropic blur requires a single sigma, got {len(sigma)}')
        if len(sigma) == 1:
            sigma = sigma * ndims
        return sigma

    @nn.compact
    def __call__(self, x, key=None):
        sigma = self.sigma
        assert sigma is not None or self.level is not None, \
            'sigma or level must be provided'
        assert not (sigma is not None and self.level is not None), \
            'only sigma or level must be provided'
        if self.level is not None:
            warnings.warn('`level` is deprecated; use `sigma` instead.')
            if self.level < 1:
                raise ValueError('Gaussian blur level must not be less than 1')
            if self.random:
                raise ValueError('level argument incompatible with random blurring')
            sigma = (self.level - 1) ** 2
        if self.isotropic and not self.random:
            raise ValueError('For non-random blurring, isotropy is implicitly '
                             'controlled by the number of sigmas provided. '
                             'Set `isotropic` only for random blur.')

        ndims = x.ndim - 2
        sigma = self._normalize_sigma(sigma, ndims)
        min_sigma = self._normalize_sigma(self.min_sigma, ndims)
        if self.isotropic and self.random:
            sigma, min_sigma = sigma[:1], min_sigma[:1]

        if not any(s > 0 for s in sigma):
            return x

        seed = self._key(key) if self.random else None
        kernel = core.gaussian_kernel(sigma=sigma, random=self.random,
                                      min_sigma=min_sigma, separate=True,
                                      dtype=x.dtype, seed=seed)
        if not isinstance(kernel, list):
            kernel = [kernel]
        if self.isotropic and self.random:
            kernel = kernel * ndims
        return core.separable_conv(x, kernel, batched=True)


class Subsample(_RandomLayer):
    """
    Random thick-slice simulation along a random spatial axis.

    Parity: reference `layers.py:367-443`. Static output shape by construction
    (composed down+up gather, see `utils.core.subsample_axis`).
    """
    stride_min: float = 1
    stride_max: float = 8
    axes: Optional[Any] = None
    prob: float = 1
    upsample: bool = True

    @nn.compact
    def __call__(self, x, key=None):
        ndims = x.ndim - 2
        assert ndims in (1, 2, 3), 'only 1D, 2D, or 3D supported'
        axes = normalize_axes(self.axes, x.shape, allowed=range(1, ndims + 1),
                              none_means_all=True)
        if self.prob == 0 or self.stride_max == 1:
            return x
        return core.subsample_axis(x, stride_min=self.stride_min,
                                   stride_max=self.stride_max, axes=list(axes),
                                   prob=self.prob, upsample=self.upsample,
                                   seed=self._key(key))


class RandomCrop(_RandomLayer):
    """
    Random multiplicative FOV crop along a random spatial axis.

    Parity: reference `layers.py:446-519`.
    """
    crop_min: float = 0
    crop_max: float = 0.5
    axis: Optional[Any] = None
    prob: float = 1
    bilateral: bool = False

    @nn.compact
    def __call__(self, x, key=None):
        ndims = x.ndim - 2
        axis = normalize_axes(self.axis, x.shape, allowed=range(1, ndims + 1),
                              none_means_all=True)
        if self.prob == 0:
            return x
        mask = aug.draw_crop_mask(x, crop_min=self.crop_min,
                                  crop_max=self.crop_max, axis=list(axis),
                                  prob=self.prob, bilateral=self.bilateral,
                                  seed=self._key(key))
        return x * mask


class RandomClip(_RandomLayer):
    """
    Random lower/upper clipping with per-axes independent thresholds and
    probability gates.

    Parity: reference `layers.py:522-628`.
    """
    clip_min: Optional[Any] = None
    clip_max: Optional[Any] = None
    prob_min: float = 1
    prob_max: float = 1
    axes: Any = 0

    def _draw_thresh(self, key, bounds, no_clip_tensor, prob, shape):
        assert 0 <= prob <= 1, f'{prob} is not a probability'
        if bounds is None or prob == 0:
            return no_clip_tensor
        k_val, k_bit = jax.random.split(key)
        if np.isscalar(bounds):
            clip_at = jnp.full(shape, bounds, no_clip_tensor.dtype)
        else:
            clip_at = jax.random.uniform(k_val, shape, minval=bounds[0],
                                         maxval=bounds[1])
            clip_at = clip_at.astype(no_clip_tensor.dtype)
        if prob < 1:
            rand_bit = (jax.random.uniform(k_bit, shape) < prob)
            rand_bit = rand_bit.astype(no_clip_tensor.dtype)
            clip_at = rand_bit * clip_at + (1 - rand_bit) * no_clip_tensor
        return clip_at

    @nn.compact
    def __call__(self, x, key=None):
        if self.prob_min == self.prob_max == 0:
            return x
        axes = normalize_axes(self.axes, x.shape, none_means_all=False)
        k_low, k_upp = jax.random.split(self._key(key))

        x_min = jnp.min(x)
        x_max = jnp.max(x)
        shape = tuple(x.shape[i] if i in axes else 1 for i in range(x.ndim))

        low = self._draw_thresh(k_low, self.clip_min, x_min, self.prob_min,
                                shape)
        upp = self._draw_thresh(k_upp, self.clip_max, x_max, self.prob_max,
                                shape)
        return jnp.clip(x, low, upp)


class SampleNormalLogVar(_RandomLayer):
    """
    Reparameterization-trick sampler: z = mu + exp(log_var/2) * N(0,1).

    Parity: reference `layers.py:2261-2302`. Uses the 'sample' RNG stream.
    """

    @nn.compact
    def __call__(self, x, key=None):
        mu, log_var = x
        key = self._key(key, stream=SAMPLE_RNG)
        noise = jax.random.normal(key, jnp.shape(mu), dtype=jnp.float32)
        return mu + jnp.exp(log_var / 2.0) * noise


class GaussianNoise(_RandomLayer):
    """
    Additive Gaussian noise with a random SD (relative to max|x| unless
    `absolute`), per-`axes` independent SDs, complex support.

    Parity: reference `layers.py:2305-2403` (stateful tf Generator replaced by
    explicit keys).
    """
    noise_min: float = 0.01
    noise_max: float = 0.10
    noise_only: bool = False
    absolute: bool = False
    axes: Any = (0, -1)

    @nn.compact
    def __call__(self, x, key=None):
        if self.noise_max == 0 and not self.noise_only:
            return x

        is_complex = jnp.issubdtype(x.dtype, jnp.complexfloating)
        assert is_complex or jnp.issubdtype(x.dtype, jnp.floating), \
            'non-FP output type'
        real_type = jnp.float32 if is_complex else x.dtype

        num_dim = x.ndim
        axes = [ax + num_dim if ax < 0 else ax for ax in np.ravel(self.axes)]
        assert all(0 <= ax < num_dim for ax in axes), 'invalid axes'

        shape_sd = tuple(x.shape[i] if i in axes else 1 for i in range(num_dim))
        k_sd, k_re, k_im = jax.random.split(self._key(key), 3)

        sd = jax.random.uniform(k_sd, shape_sd, dtype=real_type,
                                minval=self.noise_min, maxval=self.noise_max)
        if not self.absolute:
            sd = sd * jnp.max(jnp.abs(x))

        if is_complex:
            noise = jax.lax.complex(
                sd * jax.random.normal(k_re, x.shape, real_type),
                sd * jax.random.normal(k_im, x.shape, real_type))
        else:
            noise = sd * jax.random.normal(k_re, x.shape, real_type)

        return noise if self.noise_only else x + noise


class PerlinNoise(_RandomLayer):
    """
    Perlin-noise sampling layer over `draw_perlin_full`, vectorized over the
    batch (the reference loops with tf.map_fn, `layers.py:2494`).

    Parity: reference `layers.py:2406-2508`.
    """
    shape: Optional[Sequence[int]] = None
    noise_min: float = 0.01
    noise_max: float = 1
    fwhm_min: Any = 4
    fwhm_max: Any = 32
    isotropic: bool = False
    reduce: Any = jnp.std
    out_type: Any = jnp.float32
    axes: Optional[Any] = None

    @nn.compact
    def __call__(self, x, key=None):
        in_shape = x.shape
        allowed = range(1, len(in_shape))
        axes = normalize_axes(self.axes, in_shape, allowed,
                              none_means_all=False)
        shape = tuple(in_shape[1:]) if self.shape is None else tuple(self.shape)
        batch = in_shape[0]
        keys = jax.random.split(self._key(key), batch)

        def single(k):
            return aug.draw_perlin_full(
                shape, noise_min=self.noise_min, noise_max=self.noise_max,
                isotropic=self.isotropic, fwhm_min=self.fwhm_min,
                fwhm_max=self.fwhm_max, batched=False, featured=True,
                dtype=self.out_type, seed=k,
                axes=[ax - 1 for ax in axes], reduce=self.reduce)

        return jax.vmap(single)(keys)
