"""
Hypernetwork layers: convolutions/dense ops whose weights arrive as inputs.

Capability parity with reference `neurite/tf/layers.py:2515-3033` (HyperConv,
HyperConvFromDense, HyperDense, HyperDenseFromDense + 2D/3D aliases),
re-designed TPU-first: per-batch-item convolution is `jax.vmap` of
`lax.conv_general_dilated` (the reference serially maps with tf.map_fn,
`layers.py:2582-2612`) and the dense forms are single einsums on the MXU.
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.models.unet import get_activation


def _normalize_tuple(v, rank):
    return (v,) * rank if isinstance(v, int) else tuple(v)


class HyperConv(nn.Module):
    """
    N-D convolution with externally-supplied per-sample weights. Input is
    [features, kernel_weights(, bias_weights)] with kernel [B, *k, Cin, F]
    and bias [B, F].

    Parity: reference `layers.py:2515-2646`.
    """
    filters: int
    kernel_size: Union[int, Sequence[int]]
    rank: int = 3
    strides: Union[int, Sequence[int]] = 1
    padding: str = 'valid'
    dilation_rate: Union[int, Sequence[int]] = 1
    activation: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, inputs):
        x, kernel = inputs[0], inputs[1]
        bias = inputs[2] if self.use_bias else None
        rank = self.rank
        strides = _normalize_tuple(self.strides, rank)
        dilation = _normalize_tuple(self.dilation_rate, rank)
        padding = self.padding.upper()
        if padding == 'CAUSAL':
            raise ValueError('Causal padding is not supported for HyperConv')

        spatial_chars = 'DHWXYZ'[:rank]
        dn = jax.lax.conv_dimension_numbers(
            (1, *x.shape[1:]), kernel.shape[1:],
            ('N' + spatial_chars + 'C', spatial_chars + 'IO',
             'N' + spatial_chars + 'C'))

        def conv_one(xi, ki):
            return jax.lax.conv_general_dilated(
                xi[None], ki, window_strides=strides, padding=padding,
                rhs_dilation=dilation, dimension_numbers=dn)[0]

        y = jax.vmap(conv_one)(x, kernel)
        if self.use_bias:
            y = y + bias[:, *([None] * rank), :]
        act = get_activation(self.activation)
        return act(y) if act is not None else y


class HyperConv2D(HyperConv):
    rank: int = 2


class HyperConv3D(HyperConv):
    rank: int = 3


class _HyperDenseMapping(nn.Module):
    """Internal dense pseudo-layer mapping hypernet output -> target weights
    (ref `layers.py:2751-2805`)."""
    target_shape: Sequence[int]
    use_bias: bool = True
    activation: Any = None

    @nn.compact
    def __call__(self, h):
        units = int(np.prod(self.target_shape))
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (h.shape[-1], units))
        out = h @ kernel
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros_init(), (units,))
            out = out + bias
        act = get_activation(self.activation)
        if act is not None:
            out = act(out)
        return out.reshape(-1, *self.target_shape)


class HyperConvFromDense(nn.Module):
    """
    HyperConv plus the trainable dense mappings from the hypernetwork's last
    layer to kernel/bias weights. Input: [features, hypernet_output].

    Parity: reference `layers.py:2668-2805`.
    """
    filters: int
    kernel_size: Union[int, Sequence[int]]
    rank: int = 3
    strides: Union[int, Sequence[int]] = 1
    padding: str = 'valid'
    dilation_rate: Union[int, Sequence[int]] = 1
    activation: Any = None
    use_bias: bool = True
    hyperkernel_use_bias: bool = True
    hyperbias_use_bias: bool = True
    hyperkernel_activation: Any = None
    hyperbias_activation: Any = None

    @nn.compact
    def __call__(self, inputs):
        x, h = inputs
        ks = _normalize_tuple(self.kernel_size, self.rank)
        kernel_shape = (*ks, x.shape[-1], self.filters)
        kernel = _HyperDenseMapping(kernel_shape,
                                    use_bias=self.hyperkernel_use_bias,
                                    activation=self.hyperkernel_activation,
                                    name='hyperkernel')(h)
        conv = HyperConv(rank=self.rank, filters=self.filters,
                         kernel_size=ks, strides=self.strides,
                         padding=self.padding,
                         dilation_rate=self.dilation_rate,
                         activation=self.activation, use_bias=self.use_bias)
        if self.use_bias:
            bias = _HyperDenseMapping((self.filters,),
                                      use_bias=self.hyperbias_use_bias,
                                      activation=self.hyperbias_activation,
                                      name='hyperbias')(h)
            return conv([x, kernel, bias])
        return conv([x, kernel])


class HyperConv2DFromDense(HyperConvFromDense):
    rank: int = 2


class HyperConv3DFromDense(HyperConvFromDense):
    rank: int = 3


class HyperDense(nn.Module):
    """
    Dense op with externally-supplied per-sample weights. Input is
    [x, kernel(, bias)] with kernel [B, d, units], bias [B, units].

    Parity: reference `layers.py:2825-2924` (tf.map_fn -> one einsum).
    """
    units: int
    activation: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, inputs):
        x, kernel = inputs[0], inputs[1]
        y = jnp.einsum('b...i,bio->b...o', x, kernel)
        if self.use_bias:
            bias = inputs[2]
            extra = y.ndim - 2
            y = y + bias[(slice(None),) + (None,) * extra + (slice(None),)]
        act = get_activation(self.activation)
        return act(y) if act is not None else y


class HyperDenseFromDense(nn.Module):
    """
    HyperDense plus trainable dense mappings from the hypernetwork output to
    kernel/bias. Input: [x, hypernet_output].

    Parity: reference `layers.py:2927-3033`.
    """
    units: int
    activation: Any = None
    use_bias: bool = True
    hyperkernel_use_bias: bool = True
    hyperbias_use_bias: bool = True
    hyperkernel_activation: Any = None
    hyperbias_activation: Any = None

    @nn.compact
    def __call__(self, inputs):
        x, h = inputs
        kernel = _HyperDenseMapping((x.shape[-1], self.units),
                                    use_bias=self.hyperkernel_use_bias,
                                    activation=self.hyperkernel_activation,
                                    name='hyperkernel')(h)
        dense = HyperDense(units=self.units, activation=self.activation,
                           use_bias=self.use_bias)
        if self.use_bias:
            bias = _HyperDenseMapping((self.units,),
                                      use_bias=self.hyperbias_use_bias,
                                      activation=self.hyperbias_activation,
                                      name='hyperbias')(h)
            return dense([x, kernel, bias])
        return dense([x, kernel])
