"""
Basic layers: negation, rescale, resize, soft quantize, MSE, FFT/complex.

Capability parity with reference `neurite/tf/layers.py` (cites per class),
re-designed as flax modules: pure functions of their inputs, vectorized with
`vmap` instead of `tf.map_fn`, static shapes throughout.
"""

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.py.utils import normalize_axes
from neurite_tpu.utils import core


class Negate(nn.Module):
    """-x (ref `layers.py:49-64`)."""

    @nn.compact
    def __call__(self, x):
        return -x


class RescaleValues(nn.Module):
    """x * resize, a fixed scalar rescale of values (ref `layers.py:67-88`)."""
    resize: float

    @nn.compact
    def __call__(self, x):
        return x * self.resize


class Resize(nn.Module):
    """
    Spatial resize (scipy-zoom-like) of a batched [B, *spatial, C] tensor.

    Parity: reference `layers.py:91-182`. The reference maps `utils.resize`
    over the batch with tf.map_fn (`layers.py:171`); we vmap it — one fused
    XLA program, no serial loop.
    """
    zoom_factor: Union[float, Sequence[float]]
    interp_method: str = 'linear'

    @nn.compact
    def __call__(self, x):
        if isinstance(x, (list, tuple)):
            assert len(x) == 1, f'inputs has to be len 1. found: {len(x)}'
            x = x[0]
        ndims = x.ndim - 2
        zoom = self.zoom_factor
        if not isinstance(zoom, (list, tuple)):
            zoom = [zoom] * ndims
        else:
            assert len(zoom) == ndims, \
                f'zoom factor length {len(zoom)} does not match number of ' \
                f'dimensions {ndims}'
        return jax.vmap(
            lambda v: core.resize(v, list(zoom),
                                  interp_method=self.interp_method))(x)


Zoom = Resize  # scipy naming (ref layers.py:185)


class SoftQuantize(nn.Module):
    """
    Soft-quantization layer. NOTE: returns the NEGATIVE of
    utils.soft_quantize, faithfully mirroring the reference
    (`layers.py:220` — the reference layer negates).
    """
    alpha: float = 1
    bin_centers: Optional[Any] = None
    nb_bins: int = 16
    min_clip: float = -np.inf
    max_clip: float = np.inf
    return_log: bool = False

    @nn.compact
    def __call__(self, x):
        return -core.soft_quantize(x, alpha=self.alpha,
                                   bin_centers=self.bin_centers,
                                   nb_bins=(None if self.bin_centers is not None
                                            else self.nb_bins),
                                   min_clip=self.min_clip,
                                   max_clip=self.max_clip,
                                   return_log=False)


class MSE(nn.Module):
    """Per-item mean squared difference of a 2-list input (ref `layers.py:233-248`)."""

    @nn.compact
    def __call__(self, x):
        diff = jnp.square(x[0] - x[1])
        return jnp.mean(diff.reshape(diff.shape[0], -1), -1)


class FFT(nn.Module):
    """FFT over validated spatial axes (ref `layers.py:2103-2145`)."""
    axes: Optional[Any] = None
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        ndims = x.ndim - 2
        assert ndims in (1, 2, 3), 'only 1D, 2D, or 3D supported'
        axes = normalize_axes(self.axes, x.shape, allowed=range(1, ndims + 1),
                              none_means_all=True)
        return core.fftn(x, axes=axes, inverse=self.inverse)


class IFFT(nn.Module):
    """Inverse FFT (ref `layers.py:2148-2161`)."""
    axes: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return FFT(axes=self.axes, inverse=True)(x)


class FFTShift(nn.Module):
    """fftshift over spatial axes (ref `layers.py:2164-2199`)."""
    axes: Optional[Any] = None
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        ndims = x.ndim - 2
        assert ndims in (1, 2, 3), 'only 1D, 2D, or 3D supported'
        axes = normalize_axes(self.axes, x.shape, allowed=range(1, ndims + 1),
                              none_means_all=True)
        f = jnp.fft.ifftshift if self.inverse else jnp.fft.fftshift
        return f(x, axes=axes)


class IFFTShift(nn.Module):
    """Inverse fftshift (ref `layers.py:2202-2214`)."""
    axes: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return FFTShift(axes=self.axes, inverse=True)(x)


class ComplexToChannels(nn.Module):
    """Complex [..., N] -> real [..., 2N] (ref `layers.py:2217-2235`)."""

    @nn.compact
    def __call__(self, x):
        return core.complex_to_channels(x)


class ChannelsToComplex(nn.Module):
    """Real [..., 2N] -> complex [..., N] (ref `layers.py:2238-2254`)."""

    @nn.compact
    def __call__(self, x):
        return core.channels_to_complex(x)
