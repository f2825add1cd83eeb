"""
Classifier/regressor model builders.

Capability parity with reference `neurite/tf/models.py`
(`design_dnn:1620-1775`, `EncoderNet:1782-1848`, `DenseLayerNet:1851-1880`),
as flax modules.
"""

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.layers.basic import RescaleValues
from neurite_tpu.models.unet import ConvEnc, get_activation, _max_pool


class DesignDNN(nn.Module):
    """
    "Deep" CNN encoder with a dense or global-max-pool head.

    Parity: reference `models.py:1620-1775` (final_layer options:
    'dense-sigmoid', 'dense-tanh', 'dense-softmax', 'myglobalmaxpooling',
    'globalmaxpooling'; strided-conv vs maxpool downsampling).
    """
    nb_features: int
    nb_levels: int
    conv_size: Union[int, Sequence[int]]
    nb_labels: int
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    padding: str = 'same'
    activation: Any = 'elu'
    final_layer: str = 'dense-sigmoid'
    conv_dropout: float = 0
    nb_input_features: int = 1
    batch_norm: Any = False
    use_strided_convolution_maxpool: bool = True
    nb_conv_per_level: int = 2

    @nn.compact
    def __call__(self, x, training=False):
        ndims = x.ndim - 2
        act = get_activation(self.activation)
        cs = self.conv_size
        cs = (cs,) * ndims if isinstance(cs, int) else tuple(cs)
        ps = self.pool_size
        ps = (ps,) * ndims if isinstance(ps, int) else tuple(ps)

        for level in range(self.nb_levels):
            nb_lvl_feats = int(np.round(self.nb_features *
                                        self.feat_mult ** level))
            for conv in range(self.nb_conv_per_level):
                if self.conv_dropout > 0:
                    x = nn.Dropout(self.conv_dropout,
                                   deterministic=not training)(x)
                # z-decomposed impl for 3-D SAME convs (see models/unet.py)
                from neurite_tpu.models.unet import _conv_layer
                x = _conv_layer(
                    'auto', nb_lvl_feats,
                    dict(kernel_size=cs, padding=self.padding.upper(),
                         kernel_dilation=(1,) * ndims),
                    jnp.float32, None, f'conv_{level}_{conv}')(x)
                x = act(x)
            if self.use_strided_convolution_maxpool:
                x = nn.Conv(nb_lvl_feats, kernel_size=ps,
                            strides=ps, padding=self.padding.upper(),
                            name=f'strided_conv_{level}')(x)
                x = act(x)
            else:
                x = _max_pool(x, ps, self.padding)

        fl = self.final_layer
        if fl == 'dense-sigmoid':
            x = x.reshape(x.shape[0], -1)
            return jax.nn.sigmoid(nn.Dense(1, name='dense')(x))
        elif fl == 'dense-tanh':
            x = x.reshape(x.shape[0], -1)
            return jnp.tanh(nn.Dense(1, name='dense')(x))
        elif fl == 'dense-softmax':
            x = x.reshape(x.shape[0], -1)
            return jax.nn.softmax(nn.Dense(self.nb_labels, name='dense')(x))
        elif fl == 'myglobalmaxpooling':
            x = nn.BatchNorm(use_running_average=not training,
                             name='batch_norm')(x)
            x = jnp.max(x.reshape(x.shape[0], -1), 1, keepdims=True)
            x = x.reshape(-1, 1, 1)
            x = nn.Conv(1, kernel_size=(1,), name='global_max_pool_sigmoid')(x)
            return jax.nn.sigmoid(x)
        elif fl == 'globalmaxpooling':
            x = jax.nn.relu(nn.Conv(2, kernel_size=(1,) * ndims,
                                    name='conv_to_featmaps')(x))
            x = jnp.max(x.reshape(x.shape[0], -1, x.shape[-1]), axis=1)
            return jax.nn.softmax(x)
        raise ValueError(f'unknown final_layer {fl!r}')


class EncoderNetModule(nn.Module):
    """
    ConvEnc -> Flatten -> Dense(dense_size) -> Dense(nb_labels) classifier;
    regression when nb_labels <= 0.

    Parity: reference `models.py:1782-1848`.
    """
    nb_features: Any
    nb_levels: Optional[int]
    conv_size: Union[int, Sequence[int]]
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    dilation_rate_mult: int = 1
    padding: str = 'same'
    activation: Any = 'elu'
    layer_nb_feats: Optional[Sequence[int]] = None
    use_residuals: bool = False
    nb_conv_per_level: int = 2
    conv_dropout: float = 0
    dense_size: int = 256
    nb_labels: int = 2
    final_activation: Any = None
    rescale: Optional[float] = None
    dropout: Optional[float] = None
    batch_norm: Optional[int] = None

    @nn.compact
    def __call__(self, x, training=False):
        enc_out, _ = ConvEnc(
            nb_features=self.nb_features, nb_levels=self.nb_levels,
            conv_size=self.conv_size, feat_mult=self.feat_mult,
            pool_size=self.pool_size,
            dilation_rate_mult=self.dilation_rate_mult, padding=self.padding,
            activation=self.activation, layer_nb_feats=self.layer_nb_feats,
            use_residuals=self.use_residuals,
            nb_conv_per_level=self.nb_conv_per_level,
            conv_dropout=self.conv_dropout, batch_norm=self.batch_norm,
            name='enc')(x, training=training)

        flat = enc_out.reshape(enc_out.shape[0], -1)
        if self.dropout:
            flat = nn.Dropout(self.dropout, deterministic=not training,
                              name='dropout_flat')(flat)
        dense = nn.Dense(self.dense_size, name='dense')(flat)
        if self.dropout:
            dense = nn.Dropout(self.dropout, deterministic=not training,
                               name='dropout_dense')(dense)

        nb_labels = self.nb_labels
        final_activation = self.final_activation
        if nb_labels <= 0:  # regression
            nb_labels = 1
            if final_activation is None:
                final_activation = 'linear'
        elif final_activation is None:
            final_activation = 'softmax'

        if self.rescale is not None:
            dense = RescaleValues(self.rescale)(dense)
        out = nn.Dense(nb_labels, name='output_dense')(dense)
        return get_activation(final_activation)(out)


class DenseLayerNetModule(nn.Module):
    """
    MLP classifier with l1_l2 kernel regularization applied via a sown
    'losses' collection.

    Parity: reference `models.py:1851-1880` — NOTE the reference is dead code
    (`tf.kerasregularizers` / `tf.kerasmodels` typos would raise); this is the
    working equivalent. The regularization penalty is sown under
    ('losses', 'regularization') — add it to the training loss.
    """
    layer_sizes: Sequence[int]
    nb_labels: int = 2
    activation: Any = 'relu'
    final_activation: Any = 'softmax'
    dropout: Optional[float] = None
    batch_norm: Optional[bool] = None
    l1: float = 1e-5
    l2: float = 1e-4

    @nn.compact
    def __call__(self, x, training=False):
        act = get_activation(self.activation)
        x = x.reshape(x.shape[0], -1)
        reg = 0.
        for lno, size in enumerate(self.layer_sizes):
            dense = nn.Dense(size, name=f'dense{lno}')
            x = act(dense(x))
            kernel = self.variables['params'][f'dense{lno}']['kernel'] \
                if not self.is_initializing() else None
            if kernel is not None:
                reg = reg + self.l1 * jnp.sum(jnp.abs(kernel)) + \
                    (self.l2 + self.l2) * jnp.sum(jnp.square(kernel))
            if self.dropout is not None:
                x = nn.Dropout(self.dropout, deterministic=not training,
                               name=f'dropout{lno}')(x)
            if self.batch_norm is not None:
                x = nn.BatchNorm(use_running_average=not training,
                                 name=f'BatchNorm{lno}')(x)
        self.sow('losses', 'regularization', jnp.asarray(reg))
        out = nn.Dense(self.nb_labels, name='last_dense')(x)
        fa = self.final_activation
        nb = self.nb_labels
        if nb <= 0 and fa is None:
            fa = 'linear'
        return get_activation(fa or 'softmax')(out)


def design_dnn(nb_features, input_shape, nb_levels, conv_size, nb_labels,
               feat_mult=1, pool_size=2, padding='same', activation='elu',
               final_layer='dense-sigmoid', conv_dropout=0, conv_maxnorm=0,
               nb_input_features=1, batch_norm=False, name=None, prefix=None,
               use_strided_convolution_maxpool=True, nb_conv_per_level=2):
    """Build a DesignDNN module (ref `models.py:1620-1775` knob set)."""
    del input_shape, name, prefix, conv_maxnorm
    return DesignDNN(nb_features=nb_features, nb_levels=nb_levels,
                     conv_size=conv_size, nb_labels=nb_labels,
                     feat_mult=feat_mult, pool_size=pool_size,
                     padding=padding, activation=activation,
                     final_layer=final_layer, conv_dropout=conv_dropout,
                     nb_input_features=nb_input_features,
                     batch_norm=batch_norm,
                     use_strided_convolution_maxpool=
                     use_strided_convolution_maxpool,
                     nb_conv_per_level=nb_conv_per_level)


def EncoderNet(nb_features, input_shape, nb_levels, conv_size, name=None,
               prefix=None, feat_mult=1, pool_size=2, dilation_rate_mult=1,
               padding='same', activation='elu', layer_nb_feats=None,
               use_residuals=False, nb_conv_per_level=2, conv_dropout=0,
               dense_size=256, nb_labels=2, final_activation=None,
               rescale=None, dropout=None, batch_norm=None):
    """Build an EncoderNet module (ref `models.py:1782-1848` knob set)."""
    del input_shape, name, prefix
    if isinstance(nb_features, (list, tuple)):
        nb_levels = None
    return EncoderNetModule(
        nb_features=nb_features, nb_levels=nb_levels, conv_size=conv_size,
        feat_mult=feat_mult, pool_size=pool_size,
        dilation_rate_mult=dilation_rate_mult, padding=padding,
        activation=activation, layer_nb_feats=layer_nb_feats,
        use_residuals=use_residuals, nb_conv_per_level=nb_conv_per_level,
        conv_dropout=conv_dropout, dense_size=dense_size,
        nb_labels=nb_labels, final_activation=final_activation,
        rescale=rescale, dropout=dropout, batch_norm=batch_norm)


def DenseLayerNet(inshape, layer_sizes, nb_labels=2, activation='relu',
                  final_activation='softmax', dropout=None, batch_norm=None):
    """Build a DenseLayerNet module (ref `models.py:1851-1880` knob set)."""
    del inshape
    return DenseLayerNetModule(layer_sizes=layer_sizes, nb_labels=nb_labels,
                               activation=activation,
                               final_activation=final_activation,
                               dropout=dropout, batch_norm=batch_norm)
