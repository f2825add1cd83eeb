"""
Auto-encoder model builders: single-bottleneck AE and the conv (V)AE.

Capability parity with reference `neurite/tf/models.py` (`ae:249-375`,
`single_ae:438-646`), re-designed as flax modules: mu/log-var tensors are
exposed via flax `sow` ('intermediates' collection) instead of name-coupled
keras layers, and the three-part (enc, mid, dec) decomposition is explicit
submodule structure rather than stacked keras models.
"""

from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.layers.basic import Resize
from neurite_tpu.layers.local import LocalBias
from neurite_tpu.layers.random import SampleNormalLogVar
from neurite_tpu.models.unet import ConvDec, ConvEnc, AddPrior, get_activation


class SingleAE(nn.Module):
    """
    Single-bottleneck auto-encoder (input -> encoding -> output), dense or
    conv type, optionally variational.

    Parity: reference `neurite/tf/models.py:438-646`. The mu / log-var /
    sample tensors are sown into the 'intermediates' collection under
    'ae_mu' / 'ae_sigma' / 'ae_sample' (the functional replacement for the
    reference's name-tagged identity layers `'%s_ae_mu'` etc.).
    """
    enc_size: Sequence[int]
    ae_type: str = 'dense'  # 'dense' or 'conv'
    conv_size: Optional[Union[int, Sequence[int]]] = None
    enc_lambda_layers: Optional[Sequence[Callable]] = None
    batch_norm: Optional[int] = None
    padding: str = 'same'
    activation: Any = None
    include_mu_shift_layer: bool = False
    do_vae: bool = False

    @nn.compact
    def __call__(self, x, training=False, mode='full', out_shape=None):
        """
        mode: 'full' (encode+decode), 'encode' (x -> z, the sampled/mu
        latent), or 'decode' (z -> reconstruction; requires `out_shape`, the
        [*spatial, C] shape this AE reconstructs). The explicit sub-apply
        modes replace the reference's keras graph surgery
        (`neurite/tf/utils/vae.py:45-90` extract_z_dec /
        `tf/utils/model.py:86-249` mod_submodel).
        """
        assert mode in ('full', 'encode', 'decode'), mode
        if mode == 'decode':
            assert out_shape is not None, 'decode mode requires out_shape'
            input_shape = tuple(out_shape)
            input_nb_feats = input_shape[-1]
        else:
            input_shape = x.shape[1:]
            input_nb_feats = x.shape[-1]
        enc_size = list(self.enc_size)
        enc_lambda_layers = self.enc_lambda_layers or []
        act = get_activation(self.activation)

        def conv(nf, name):
            ndims = len(input_shape) - 1
            cs = self.conv_size
            assert cs is not None, 'with conv ae, need conv_size'
            cs = (cs,) * ndims if isinstance(cs, int) else tuple(cs)
            def apply(t):
                from neurite_tpu.models.unet import _conv_layer
                t = _conv_layer(
                    'auto', nf,
                    dict(kernel_size=cs, padding=self.padding.upper(),
                         kernel_dilation=(1,) * ndims),
                    jnp.float32, None, name)(t)
                return act(t) if act is not None else t
            return apply

        # flatten for dense bottleneck
        if self.ae_type == 'dense' and len(input_shape) > 1:
            pre_enc = x.reshape(x.shape[0], -1)
        else:
            pre_enc = x

        def encode_branch(tag):
            if self.ae_type == 'dense':
                assert len(enc_size) == 1, \
                    'enc_size should be of length 1 for dense layer'
                t = nn.Dense(enc_size[0], name=f'ae_{tag}_enc_dense')(pre_enc)
            else:
                assert len(enc_size) == len(input_shape), \
                    f'encoding size does not match input shape ' \
                    f'{len(enc_size)} {len(input_shape)}'
                if list(enc_size)[:-1] != list(input_shape)[:-1]:
                    t = conv(enc_size[-1], f'ae_{tag}_enc_conv')(pre_enc)
                    zf = [enc_size[:-1][f] / t.shape[1:-1][f]
                          for f in range(len(enc_size) - 1)]
                    t = Resize(zoom_factor=zf, name=f'ae_{tag}_enc')(t)
                elif enc_size[-1] is None:
                    if tag == 'mu':
                        t = pre_enc
                    else:  # sigma branch must be a distinct conv (ref :591-595)
                        t = conv(pre_enc.shape[-1], f'ae_{tag}_enc')(pre_enc)
                else:
                    t = conv(enc_size[-1], f'ae_{tag}_enc')(pre_enc)

            for fcn in enc_lambda_layers:
                t = fcn(t)
            if self.batch_norm is not None:
                t = nn.BatchNorm(use_running_average=not training,
                                 axis=self.batch_norm,
                                 name=f'ae_{tag}_bn')(t)
            return t

        if mode == 'decode':
            t = x
        else:
            t = encode_branch('mu')
            if self.include_mu_shift_layer:
                t = LocalBias(name='ae_mu_shift')(t)
            self.sow('intermediates', 'ae_mu', t)

            if self.do_vae:
                mu_tensor = t
                logvar_tensor = encode_branch('sigma')
                self.sow('intermediates', 'ae_sigma', logvar_tensor)
                t = SampleNormalLogVar(name='ae_sample_layer')(
                    [mu_tensor, logvar_tensor])
                self.sow('intermediates', 'ae_sample', t)

            if mode == 'encode':
                return t

        if self.include_mu_shift_layer:
            t = LocalBias(name='ae_sample_shift')(t)

        # decode
        if self.ae_type == 'dense':
            t = nn.Dense(int(np.prod(input_shape)), name='ae_dense_dec')(t)
            if len(input_shape) > 1:
                t = t.reshape(-1, *input_shape)
        else:
            if list(enc_size)[:-1] != list(input_shape)[:-1]:
                zf = [input_shape[:-1][f] / enc_size[:-1][f]
                      for f in range(len(enc_size) - 1)]
                t = Resize(zoom_factor=zf, name='ae_mu_dec')(t)
            t = conv(input_nb_feats, 'ae_conv_dec')(t)

        if self.batch_norm is not None:
            t = nn.BatchNorm(use_running_average=not training,
                             axis=self.batch_norm, name='bn_ae_dec')(t)
        return t


class AE(nn.Module):
    """
    Convolutional auto-encoder: ConvEnc -> SingleAE bottleneck -> ConvDec
    (no skips), optionally variational, optionally with a prior head.

    Parity: reference `neurite/tf/models.py:249-375`. `return_parts=True` in
    the call returns (out, mid_out, enc_out) — the functional equivalent of
    the reference's (dec, mid, enc) model tuple.
    """
    nb_features: Any
    nb_levels: Optional[int]
    conv_size: Union[int, Sequence[int]]
    nb_labels: int
    enc_size: Sequence[int]
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    padding: str = 'same'
    activation: Any = 'elu'
    use_residuals: bool = False
    nb_conv_per_level: int = 1
    batch_norm: Optional[int] = None
    enc_batch_norm: Optional[int] = None
    ae_type: str = 'conv'
    enc_lambda_layers: Optional[Sequence[Callable]] = None
    add_prior_layer: bool = False
    use_logp: bool = True
    conv_dropout: float = 0
    include_mu_shift_layer: bool = False
    final_pred_activation: Any = 'softmax'
    do_vae: bool = False
    dtype: Any = None  # computation dtype (bf16 = MXU fast path)

    @nn.compact
    def __call__(self, x, prior=None, training=False, return_parts=False,
                 mode='full', enc_shape=None):
        """
        mode: 'full', 'encode' (x -> latent z), or 'decode' (z -> output;
        requires `enc_shape`, the encoder-output [*spatial, C] shape — get it
        from `ne.utils.vae.enc_output_shape`). Explicit sub-apply replaces
        keras graph surgery (ref `neurite/tf/utils/vae.py:45-90`).
        """
        assert mode in ('full', 'encode', 'decode'), mode
        nb_levels = (len(self.nb_features)
                     if isinstance(self.nb_features, (list, tuple))
                     else self.nb_levels)

        mid = SingleAE(
            enc_size=self.enc_size, ae_type=self.ae_type,
            conv_size=self.conv_size,
            enc_lambda_layers=self.enc_lambda_layers,
            batch_norm=self.enc_batch_norm,
            padding=self.padding,
            include_mu_shift_layer=self.include_mu_shift_layer,
            do_vae=self.do_vae, name='mid')

        if mode == 'decode':
            assert enc_shape is not None, 'decode mode requires enc_shape'
            enc_out = None
            mid_out = mid(x, training=training, mode='decode',
                          out_shape=enc_shape)
        else:
            enc_out, _ = ConvEnc(
                nb_features=self.nb_features, nb_levels=nb_levels,
                conv_size=self.conv_size, feat_mult=self.feat_mult,
                pool_size=self.pool_size, padding=self.padding,
                activation=self.activation,
                use_residuals=self.use_residuals,
                nb_conv_per_level=self.nb_conv_per_level,
                conv_dropout=self.conv_dropout, batch_norm=self.batch_norm,
                dtype=self.dtype, name='enc')(x, training=training)
            if mode == 'encode':
                return mid(enc_out, training=training, mode='encode')
            mid_out = mid(enc_out, training=training)

        out = ConvDec(
            nb_features=self.nb_features, nb_levels=nb_levels,
            conv_size=self.conv_size, nb_labels=self.nb_labels,
            feat_mult=self.feat_mult, pool_size=self.pool_size,
            use_skip_connections=False, padding=self.padding,
            activation=self.activation, use_residuals=self.use_residuals,
            final_pred_activation=('linear' if self.add_prior_layer
                                   else self.final_pred_activation),
            nb_conv_per_level=self.nb_conv_per_level,
            batch_norm=self.batch_norm, conv_dropout=self.conv_dropout,
            name='dec')(mid_out, training=training)

        if self.add_prior_layer:
            assert prior is not None, 'add_prior_layer requires a prior input'
            out = AddPrior(use_logp=self.use_logp,
                           final_pred_activation=self.final_pred_activation,
                           name='prior')(out, prior)

        if return_parts:
            return out, mid_out, enc_out
        return out


def ae(nb_features, input_shape, nb_levels, conv_size, nb_labels, enc_size,
       name='ae', prefix=None, feat_mult=1, pool_size=2, padding='same',
       activation='elu', use_residuals=False, nb_conv_per_level=1,
       batch_norm=None, enc_batch_norm=None, ae_type='conv',
       enc_lambda_layers=None, add_prior_layer=False, add_prior_layer_reg=0,
       use_logp=True, conv_dropout=0, include_mu_shift_layer=False,
       single_model=False, final_pred_activation='softmax', src=None,
       src_input=None, do_vae=False, dtype=None):
    """Build an AE module (reference `models.py:249-375` knob set)."""
    del name, prefix, add_prior_layer_reg, input_shape, src, src_input
    del single_model  # flax module always exposes parts via return_parts
    if isinstance(nb_features, (list, tuple)):
        nb_levels = None
    return AE(nb_features=nb_features, nb_levels=nb_levels,
              conv_size=conv_size, nb_labels=nb_labels, enc_size=enc_size,
              feat_mult=feat_mult, pool_size=pool_size, padding=padding,
              activation=activation, use_residuals=use_residuals,
              nb_conv_per_level=nb_conv_per_level, batch_norm=batch_norm,
              enc_batch_norm=enc_batch_norm, ae_type=ae_type,
              enc_lambda_layers=enc_lambda_layers,
              add_prior_layer=add_prior_layer, use_logp=use_logp,
              conv_dropout=conv_dropout,
              include_mu_shift_layer=include_mu_shift_layer,
              final_pred_activation=final_pred_activation, do_vae=do_vae,
              dtype=dtype)


def single_ae(enc_size, input_shape, name='single_ae', prefix=None,
              ae_type='dense', conv_size=None, input_model=None,
              enc_lambda_layers=None, batch_norm=True, padding='same',
              activation=None, include_mu_shift_layer=False, do_vae=False):
    """Build a SingleAE module (reference `models.py:438-646` knob set)."""
    del name, prefix, input_shape, input_model
    # reference default batch_norm=True is an axis in keras terms; map to -1
    if batch_norm is True:
        batch_norm = -1
    return SingleAE(enc_size=enc_size, ae_type=ae_type, conv_size=conv_size,
                    enc_lambda_layers=enc_lambda_layers,
                    batch_norm=batch_norm, padding=padding,
                    activation=activation,
                    include_mu_shift_layer=include_mu_shift_layer,
                    do_vae=do_vae)
