"""
Conv encoder/decoder and UNet/hourglass builders (flax).

Capability parity with reference `neurite/tf/models.py` builders
(`conv_enc:1309-1442`, `conv_dec:1445-1617`, `unet:88-246`, `add_prior:378-435`,
`dilation_net:45-85`), re-designed TPU-first:

- flax `nn.Module`s with explicit data flow — skip connections are passed as
  values, not found by layer-name lookup (`models.py:1536-1542`);
- channels-last [B, *spatial, C] layout (matches reference and TPU lanes);
- every knob of the reference builders is preserved (nb_features list-of-lists
  override, feat_mult, layer_nb_feats, dilation_rate_mult, residuals,
  feature-space dropout, batch_norm, pool_size, padding, final activations).
"""

from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.utils import core


def get_activation(act) -> Optional[Callable]:
    """Map a keras-style activation name to a jax function."""
    if act is None or callable(act):
        return act
    table = {
        'elu': jax.nn.elu,
        'relu': jax.nn.relu,
        'gelu': jax.nn.gelu,
        'tanh': jnp.tanh,
        'sigmoid': jax.nn.sigmoid,
        'softmax': jax.nn.softmax,
        'linear': lambda x: x,
        'softplus': jax.nn.softplus,
        'leaky_relu': jax.nn.leaky_relu,
        'exp': jnp.exp,
    }
    if act not in table:
        raise ValueError(f'unknown activation {act!r}')
    return table[act]


def _conv_opts(ndims, conv_size, padding, dilation):
    if isinstance(conv_size, int):
        conv_size = (conv_size,) * ndims
    pad = padding.upper() if isinstance(padding, str) else padding
    return dict(kernel_size=tuple(conv_size), padding=pad,
                kernel_dilation=(int(dilation),) * ndims)


class Im2ColConv(nn.Module):
    """
    nn.Conv-compatible SAME/stride-1 convolution via tap-stacked matmul
    (`neurite_tpu.ops.im2col`): K = k^N * C_in tiles the MXU where native
    small-channel convs pad to 128 lanes. Same parameter names/shapes as
    nn.Conv, so checkpoints are interchangeable.
    """
    features: int
    kernel_size: Any = None
    param_dtype: Any = jnp.float32
    dtype: Any = None
    use_bias: bool = True
    # only small contractions benefit AND fit: the tap stack is k^N * C_in
    # times the input (OOMs a 128^3 UNet when C_in is the skip-concat width),
    # while the measured win concentrates at tiny C_in (26x at C_in=1).
    # Larger convs silently use the identical-parameter native path.
    max_k: int = 256

    @nn.compact
    def __call__(self, x):
        from neurite_tpu.ops.im2col import conv_im2col
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (*self.kernel_size, cin, self.features),
                            self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype) \
            if self.use_bias else None
        dt = self.dtype or x.dtype
        k_total = cin * int(np.prod(self.kernel_size))
        if k_total > self.max_k:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape,
                ('N' + 'DHW'[-len(self.kernel_size):] + 'C',
                 'DHW'[-len(self.kernel_size):] + 'IO',
                 'N' + 'DHW'[-len(self.kernel_size):] + 'C'))
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt),
                (1,) * len(self.kernel_size), 'SAME',
                dimension_numbers=dn)
            return y + bias.astype(dt) if bias is not None else y
        return conv_im2col(x.astype(dt), kernel.astype(dt),
                           None if bias is None else bias.astype(dt))


class ZDecompConv(nn.Module):
    """
    nn.Conv-compatible 3-D SAME/stride-1 convolution via z-decomposed 2-D
    convs (`neurite_tpu.ops.zdecomp`): XLA's conv2d path is ~13x faster than
    conv3d at these shapes on TPU. Same parameter names/shapes as nn.Conv.
    """
    features: int
    kernel_size: Any = None
    param_dtype: Any = jnp.float32
    dtype: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from neurite_tpu.ops.zdecomp import conv_z2d
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (*self.kernel_size, cin, self.features),
                            self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype) \
            if self.use_bias else None
        dt = self.dtype or x.dtype
        return conv_z2d(x.astype(dt), kernel.astype(dt),
                        None if bias is None else bias.astype(dt))


class PointwiseConv(nn.Module):
    """
    nn.Conv-compatible 1x...x1 convolution computed as a per-voxel matmul.

    Identical parameters (kernel [1,..,1,C,F], bias [F]) and math to
    nn.Conv, but expressed as `dot_general` over the channel axis: XLA's
    conv path chooses an 'InputFeaturePackedInputBatchInLanes' emitter for
    the weight gradient of full-volume 1x1 convs, which forces both
    operands into a T(2,128) layout — measured 8.8ms (two full-volume
    relayout copies + a 4.5ms conv fusion) of the 44.6ms UNet-128^3 train
    step for the final 'likelihood' conv alone. The matmul form keeps the
    native layout (docs/DESIGN.md "Training step").
    """
    features: int
    kernel_size: Any = None
    param_dtype: Any = jnp.float32
    dtype: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (*self.kernel_size, cin, self.features),
                            self.param_dtype)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype) \
            if self.use_bias else None
        dt = self.dtype or x.dtype
        k2 = kernel.reshape(cin, self.features).astype(dt)
        y = jax.lax.dot_general(x.astype(dt), k2,
                                (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias.astype(dt) if bias is not None else y


def _conv_layer(conv_impl, nf, opts, param_dtype, dtype, name):
    """
    Pick the conv implementation. 'auto' (default) uses the z-decomposed
    2-D form for 3-D SAME/undilated convs — identical math and parameters,
    13x faster than native conv3d on v5e (ops/zdecomp.py). 'im2col' adds
    tap-stacked matmuls for tiny channel counts. Everything else (2-D,
    dilated, valid-padded) uses nn.Conv.
    """
    same = str(opts.get('padding', '')).upper() == 'SAME'
    undilated = all(d == 1 for d in opts.get('kernel_dilation', (1,)))
    is_3d = len(opts['kernel_size']) == 3
    if (conv_impl in ('auto', 'z2d', 'im2col') and undilated
            and all(k == 1 for k in opts['kernel_size'])):
        return PointwiseConv(nf, kernel_size=opts['kernel_size'],
                             param_dtype=param_dtype, dtype=dtype, name=name)
    if conv_impl == 'im2col' and same and undilated:
        return Im2ColConv(nf, kernel_size=opts['kernel_size'],
                          param_dtype=param_dtype, dtype=dtype, name=name)
    if conv_impl in ('auto', 'z2d') and same and undilated and is_3d:
        return ZDecompConv(nf, kernel_size=opts['kernel_size'],
                           param_dtype=param_dtype, dtype=dtype, name=name)
    return nn.Conv(nf, **opts, param_dtype=param_dtype, dtype=dtype,
                   name=name)


def _level_feats(nb_features, feat_mult, level, nb_conv_per_level,
                 layer_nb_feats, lf_offset):
    """
    Per-level feature schedule, honoring the reference's three override layers
    (`models.py:1362-1381`): nb_features list-of-lists > layer_nb_feats >
    nb_features * feat_mult**level.
    Returns a list of feature counts, one per conv in the level.
    """
    if isinstance(nb_features, (list, tuple)):
        lvl = nb_features[level]
        if isinstance(lvl, (list, tuple)):
            return list(lvl)
        return [int(lvl)] * nb_conv_per_level
    feats = []
    for conv in range(nb_conv_per_level):
        if layer_nb_feats is not None:
            feats.append(int(layer_nb_feats[lf_offset + conv]))
        else:
            feats.append(int(np.round(nb_features * feat_mult ** level)))
    return feats


def _max_pool(x, pool_size, padding):
    from neurite_tpu.ops.pool import max_pool
    ndims = x.ndim - 2
    if isinstance(pool_size, int):
        pool_size = (pool_size,) * ndims
    window = tuple(int(p) for p in pool_size)
    return max_pool(x, window, strides=window,
                    padding=padding.upper() if isinstance(padding, str)
                    else padding)


def _upsample(x, pool_size):
    """Nearest-neighbor upsampling (keras UpSamplingND semantics)."""
    ndims = x.ndim - 2
    if isinstance(pool_size, int):
        pool_size = (pool_size,) * ndims
    for ax, p in enumerate(pool_size):
        if p != 1:
            x = jnp.repeat(x, int(p), axis=ax + 1)
    return x


class ConvEnc(nn.Module):
    """
    Fully-convolutional encoder arm.

    Parity: reference `neurite/tf/models.py:1309-1442`. Returns
    (bottleneck, skips) where skips[level] is the level's last conv output —
    the tensors the reference decoder locates by name
    ('%s_conv_downarm_%d_%d', `models.py:1536-1542`).
    """
    nb_features: Any
    nb_levels: Optional[int]
    conv_size: Union[int, Sequence[int]]
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    padding: str = 'same'
    dilation_rate_mult: int = 1
    activation: Any = 'elu'
    layer_nb_feats: Optional[Sequence[int]] = None
    use_residuals: bool = False
    nb_conv_per_level: int = 2
    conv_dropout: float = 0
    batch_norm: Optional[int] = None
    param_dtype: Any = jnp.float32
    dtype: Any = None  # computation dtype; bf16 runs convs on the MXU fast path
    conv_impl: str = 'auto'  # 'auto' (z-decomp 3-D), 'native', 'im2col', 'z2d'

    @nn.compact
    def __call__(self, x, training=False):
        ndims = x.ndim - 2
        act = get_activation(self.activation)
        nb_levels = (len(self.nb_features)
                     if isinstance(self.nb_features, (list, tuple))
                     else self.nb_levels)

        skips = []
        lfidx = 0
        for level in range(nb_levels):
            lvl_first = x
            feats = _level_feats(self.nb_features, self.feat_mult, level,
                                 self.nb_conv_per_level, self.layer_nb_feats,
                                 lfidx)
            lfidx += len(feats)
            dilation = self.dilation_rate_mult ** level
            opts = _conv_opts(ndims, self.conv_size, self.padding, dilation)

            for conv, nf in enumerate(feats):
                last = conv == len(feats) - 1
                x = _conv_layer(self.conv_impl, nf, opts,
                                self.param_dtype, self.dtype,
                                f'conv_downarm_{level}_{conv}')(x)
                # last conv of a residual level has no activation (ref :1383-1388)
                if not (last and self.use_residuals):
                    x = act(x)
                if self.conv_dropout > 0:
                    # feature-space dropout: broadcast over spatial dims
                    x = nn.Dropout(self.conv_dropout,
                                   broadcast_dims=tuple(range(1, 1 + ndims)),
                                   deterministic=not training)(x)

            if self.use_residuals:
                convarm = x
                nb_in = lvl_first.shape[-1]
                nb_out = convarm.shape[-1]
                add_layer = lvl_first
                if nb_in > 1 and nb_out > 1 and nb_in != nb_out:
                    add_layer = _conv_layer(
                        self.conv_impl, feats[-1], opts, self.param_dtype,
                        self.dtype, f'expand_down_merge_{level}')(lvl_first)
                    add_layer = act(add_layer)
                    if self.conv_dropout > 0:
                        add_layer = nn.Dropout(
                            self.conv_dropout,
                            broadcast_dims=tuple(range(1, 1 + ndims)),
                            deterministic=not training)(add_layer)
                x = act(add_layer + convarm)

            if self.batch_norm is not None:
                x = nn.BatchNorm(use_running_average=not training,
                                 dtype=self.dtype,
                                 axis=self.batch_norm,
                                 name=f'bn_down_{level}')(x)

            skips.append(x)
            if level < nb_levels - 1:
                x = _max_pool(x, self.pool_size, self.padding)

        return x, skips


class ConvDec(nn.Module):
    """
    Fully-convolutional decoder arm: per level upsample (+skip concat), convs,
    optional residual/BN; final 1x1 'likelihood' conv + prediction activation.

    Parity: reference `neurite/tf/models.py:1445-1617`. Skips are explicit
    inputs instead of the reference's name-coupled graph lookup.
    """
    nb_features: Any
    nb_levels: Optional[int]
    conv_size: Union[int, Sequence[int]]
    nb_labels: int
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    use_skip_connections: bool = False
    padding: str = 'same'
    dilation_rate_mult: int = 1
    activation: Any = 'elu'
    use_residuals: bool = False
    final_pred_activation: Any = 'softmax'
    nb_conv_per_level: int = 2
    layer_nb_feats: Optional[Sequence[int]] = None
    batch_norm: Optional[int] = None
    conv_dropout: float = 0
    param_dtype: Any = jnp.float32
    dtype: Any = None  # computation dtype; bf16 runs convs on the MXU fast path
    conv_impl: str = 'auto'  # 'auto' (z-decomp 3-D), 'native', 'im2col', 'z2d'

    @nn.compact
    def __call__(self, x, skips=None, training=False):
        ndims = x.ndim - 2
        act = get_activation(self.activation)
        nb_levels = (len(self.nb_features)
                     if isinstance(self.nb_features, (list, tuple))
                     else self.nb_levels)
        if self.use_skip_connections:
            assert skips is not None, \
                'using skip connections requires encoder skip tensors'

        lfidx = 0
        for level in range(nb_levels - 1):
            lindex = nb_levels - 2 - level
            feats = _level_feats(self.nb_features, self.feat_mult, lindex,
                                 self.nb_conv_per_level, self.layer_nb_feats,
                                 lfidx)
            lfidx += len(feats)
            dilation = self.dilation_rate_mult ** lindex
            opts = _conv_opts(ndims, self.conv_size, self.padding, dilation)

            x = _upsample(x, self.pool_size)
            up_tensor = x

            if self.use_skip_connections:
                cat_tensor = skips[lindex]
                x = jnp.concatenate([cat_tensor, x], axis=-1)

            for conv, nf in enumerate(feats):
                last = conv == len(feats) - 1
                x = _conv_layer(self.conv_impl, nf, opts,
                                self.param_dtype, self.dtype,
                                f'conv_uparm_{nb_levels + level}_{conv}')(x)
                if not (last and self.use_residuals):
                    x = act(x)
                if self.conv_dropout > 0:
                    x = nn.Dropout(self.conv_dropout,
                                   broadcast_dims=tuple(range(1, 1 + ndims)),
                                   deterministic=not training)(x)

            if self.use_residuals:
                add_layer = up_tensor
                nb_in = add_layer.shape[-1]
                nb_out = x.shape[-1]
                if nb_in > 1 and nb_out > 1 and nb_in != nb_out:
                    add_layer = _conv_layer(
                        self.conv_impl, feats[-1], opts, self.param_dtype,
                        self.dtype, f'expand_up_merge_{level}')(add_layer)
                    add_layer = act(add_layer)
                x = act(x + add_layer)

            if self.batch_norm is not None:
                x = nn.BatchNorm(use_running_average=not training,
                                 dtype=self.dtype,
                                 axis=self.batch_norm,
                                 name=f'bn_up_{level}')(x)

        # final 1x1 likelihood conv (no activation); matmul-form avoids
        # XLA's slow 1x1-conv weight-grad emitter (see PointwiseConv)
        like = PointwiseConv(self.nb_labels, kernel_size=(1,) * ndims,
                             param_dtype=self.param_dtype,
                             dtype=self.dtype,
                             name='likelihood')(x)

        if self.final_pred_activation == 'softmax':
            pred = jax.nn.softmax(like, axis=-1)
        elif self.final_pred_activation in (None, 'linear'):
            pred = like
        else:
            pred = get_activation(self.final_pred_activation)(like)
        return pred


class AddPrior(nn.Module):
    """
    Posterior head merging a likelihood with a spatial prior: log-prior add
    (use_logp) or sigmoid-likelihood multiply, then final activation.

    Parity: reference `neurite/tf/models.py:378-435`.
    """
    use_logp: bool = True
    final_pred_activation: Any = 'softmax'

    @nn.compact
    def __call__(self, like, prior):
        if self.use_logp:
            post = prior + like
        else:
            post = prior * jax.nn.sigmoid(like)

        if self.final_pred_activation == 'softmax':
            assert self.use_logp, 'cannot do softmax when adding prior via P()'
            return jax.nn.softmax(post, axis=-1)
        return post


class UNet(nn.Module):
    """
    UNet/hourglass: ConvEnc + ConvDec(use_skip_connections) + optional prior
    head. Multiple inputs (list) are concatenated on the channel axis
    (ref `models.py:155-167`).

    Parity: reference `neurite/tf/models.py:88-246`.
    """
    nb_features: Any
    nb_levels: Optional[int]
    conv_size: Union[int, Sequence[int]]
    nb_labels: int
    feat_mult: float = 1
    pool_size: Union[int, Sequence[int]] = 2
    use_logp: bool = True
    padding: str = 'same'
    dilation_rate_mult: int = 1
    activation: Any = 'elu'
    use_residuals: bool = False
    final_pred_activation: Any = 'softmax'
    nb_conv_per_level: int = 1
    add_prior_layer: bool = False
    layer_nb_feats: Optional[Sequence[int]] = None
    conv_dropout: float = 0
    batch_norm: Optional[int] = None
    param_dtype: Any = jnp.float32
    dtype: Any = None  # computation dtype; bf16 runs convs on the MXU fast path
    space_to_depth: int = 1  # fold 2^N spatial blocks into channels (TPU perf)
    conv_impl: str = 'auto'  # 'auto' (z-decomp 3-D), 'native', 'im2col', 'z2d'
    remat: bool = False  # rematerialize enc/dec on backward (fit big batches)

    @nn.compact
    def __call__(self, x, prior=None, training=False):
        if isinstance(x, (list, tuple)):
            spatial = x[0].shape[1:-1]
            for xi in x[1:]:
                if xi.shape[1:-1] != spatial:
                    raise ValueError(
                        'spatial dimensions must match if multiple inputs are '
                        f'provided, but got shapes {spatial} and {xi.shape[1:-1]}')
            x = jnp.concatenate(x, axis=-1)

        # space-to-depth variant (TPU perf, NOT reference-parity): fold
        # block^N spatial tiles into channels so small-channel 3-D convs fill
        # the 128-wide vector lanes; logits unfold before the prediction
        # activation. See docs/DESIGN.md.
        s2d = int(self.space_to_depth)
        ndims_in = x.ndim - 2
        if s2d > 1:
            from neurite_tpu.utils import core as _core
            x = _core.space_to_depth(x, s2d)

        nb_levels = (len(self.nb_features)
                     if isinstance(self.nb_features, (list, tuple))
                     else self.nb_levels)
        nb_conv = self.nb_conv_per_level
        enc_lnf = (self.layer_nb_feats[:nb_levels * nb_conv]
                   if self.layer_nb_feats is not None else None)
        dec_lnf = (self.layer_nb_feats[nb_levels * nb_conv:]
                   if self.layer_nb_feats is not None else None)

        # remat: store only level inputs/outputs (incl. skips) and recompute
        # conv intermediates on backward — jax.checkpoint as an nn transform;
        # trades ~30% more conv FLOPs for the activation memory that
        # otherwise caps the batch (128^3 batch 8 needs 27.4G vs 15.75G HBM)
        EncCls = (nn.remat(ConvEnc, static_argnums=(2,)) if self.remat
                  else ConvEnc)
        DecCls = (nn.remat(ConvDec, static_argnums=(3,)) if self.remat
                  else ConvDec)
        x, skips = EncCls(
            nb_features=self.nb_features, nb_levels=nb_levels,
            conv_size=self.conv_size, feat_mult=self.feat_mult,
            pool_size=self.pool_size, padding=self.padding,
            dilation_rate_mult=self.dilation_rate_mult,
            activation=self.activation, layer_nb_feats=enc_lnf,
            use_residuals=self.use_residuals,
            nb_conv_per_level=nb_conv, conv_dropout=self.conv_dropout,
            batch_norm=self.batch_norm, param_dtype=self.param_dtype,
            dtype=self.dtype, conv_impl=self.conv_impl,
            name='enc')(x, training)

        dec_labels = (self.nb_labels * s2d ** ndims_in if s2d > 1
                      else self.nb_labels)
        dec_final_act = 'linear' if (self.add_prior_layer or s2d > 1) \
            else self.final_pred_activation
        pred = DecCls(
            nb_features=self.nb_features, nb_levels=nb_levels,
            conv_size=self.conv_size, nb_labels=dec_labels,
            feat_mult=self.feat_mult, pool_size=self.pool_size,
            use_skip_connections=True, padding=self.padding,
            dilation_rate_mult=self.dilation_rate_mult,
            activation=self.activation, use_residuals=self.use_residuals,
            final_pred_activation=dec_final_act,
            nb_conv_per_level=nb_conv, layer_nb_feats=dec_lnf,
            batch_norm=self.batch_norm, conv_dropout=self.conv_dropout,
            param_dtype=self.param_dtype, dtype=self.dtype,
            conv_impl=self.conv_impl, name='dec')(
                x, skips, training)

        if s2d > 1:
            from neurite_tpu.utils import core as _core
            pred = _core.depth_to_space(pred, s2d)
            if not self.add_prior_layer:
                act = self.final_pred_activation
                if act == 'softmax':
                    pred = jax.nn.softmax(pred, axis=-1)
                elif act not in (None, 'linear'):
                    from neurite_tpu.models.unet import get_activation
                    fn = get_activation(act)
                    pred = fn(pred) if fn is not None else pred

        if self.add_prior_layer:
            assert prior is not None, 'add_prior_layer requires a prior input'
            pred = AddPrior(use_logp=self.use_logp,
                            final_pred_activation=self.final_pred_activation,
                            name='prior')(pred, prior)
        return pred


###############################################################################
# builder functions (reference API)
###############################################################################

def unet(nb_features, input_shape, nb_levels, conv_size, nb_labels,
         name='unet', prefix=None, feat_mult=1, pool_size=2, use_logp=True,
         padding='same', dilation_rate_mult=1, activation='elu',
         use_residuals=False, final_pred_activation='softmax',
         nb_conv_per_level=1, add_prior_layer=False, add_prior_layer_reg=0,
         layer_nb_feats=None, conv_dropout=0, batch_norm=None, dtype=None,
         space_to_depth=1, conv_impl='auto', remat=False):
    """
    Build a UNet module (reference `neurite/tf/models.py:88-246` knob set).

    Returns an `nn.Module`; `input_shape` is kept for config parity and used by
    `neurite_tpu.modelio` helpers to initialize parameters.
    """
    del name, prefix, add_prior_layer_reg, input_shape  # naming/keras-isms
    if isinstance(nb_features, (list, tuple)) and nb_levels is not None:
        nb_levels = None  # list-of-lists overrides nb_levels (ref :179-190)
    return UNet(nb_features=nb_features, nb_levels=nb_levels,
                conv_size=conv_size, nb_labels=nb_labels, feat_mult=feat_mult,
                pool_size=pool_size, use_logp=use_logp, padding=padding,
                dilation_rate_mult=dilation_rate_mult, activation=activation,
                use_residuals=use_residuals,
                final_pred_activation=final_pred_activation,
                nb_conv_per_level=nb_conv_per_level,
                add_prior_layer=add_prior_layer,
                layer_nb_feats=layer_nb_feats, conv_dropout=conv_dropout,
                batch_norm=batch_norm, dtype=dtype,
                space_to_depth=space_to_depth, conv_impl=conv_impl,
                remat=remat)


def dilation_net(nb_features, input_shape, nb_levels, conv_size, nb_labels,
                 name='dilation_net', prefix=None, feat_mult=1, pool_size=2,
                 use_logp=True, padding='same', dilation_rate_mult=2,
                 activation='elu', use_residuals=False,
                 final_pred_activation='softmax', nb_conv_per_level=1,
                 add_prior_layer=False, add_prior_layer_reg=0,
                 layer_nb_feats=None, conv_dropout=0, batch_norm=None,
                 dtype=None, space_to_depth=1, conv_impl='auto',
                 remat=False):
    """UNet preset with dilation_rate_mult=2 (ref `models.py:45-85`)."""
    return unet(nb_features, input_shape, nb_levels, conv_size, nb_labels,
                name=name, prefix=prefix, feat_mult=feat_mult,
                pool_size=pool_size, use_logp=use_logp, padding=padding,
                dilation_rate_mult=dilation_rate_mult, activation=activation,
                use_residuals=use_residuals,
                final_pred_activation=final_pred_activation,
                nb_conv_per_level=nb_conv_per_level,
                add_prior_layer=add_prior_layer,
                add_prior_layer_reg=add_prior_layer_reg,
                layer_nb_feats=layer_nb_feats, conv_dropout=conv_dropout,
                batch_norm=batch_norm, dtype=dtype,
                space_to_depth=space_to_depth, conv_impl=conv_impl,
                remat=remat)


def conv_enc(nb_features, input_shape, nb_levels, conv_size, name=None,
             prefix=None, feat_mult=1, pool_size=2, dilation_rate_mult=1,
             padding='same', activation='elu', layer_nb_feats=None,
             use_residuals=False, nb_conv_per_level=2, conv_dropout=0,
             batch_norm=None):
    """Build a ConvEnc module (ref `models.py:1309-1442` knob set)."""
    del name, prefix, input_shape
    return ConvEnc(nb_features=nb_features, nb_levels=nb_levels,
                   conv_size=conv_size, feat_mult=feat_mult,
                   pool_size=pool_size, dilation_rate_mult=dilation_rate_mult,
                   padding=padding, activation=activation,
                   layer_nb_feats=layer_nb_feats, use_residuals=use_residuals,
                   nb_conv_per_level=nb_conv_per_level,
                   conv_dropout=conv_dropout, batch_norm=batch_norm)


def conv_dec(nb_features, input_shape, nb_levels, conv_size, nb_labels,
             name=None, prefix=None, feat_mult=1, pool_size=2,
             use_skip_connections=False, padding='same', dilation_rate_mult=1,
             activation='elu', use_residuals=False,
             final_pred_activation='softmax', nb_conv_per_level=2,
             layer_nb_feats=None, batch_norm=None, conv_dropout=0):
    """Build a ConvDec module (ref `models.py:1445-1617` knob set)."""
    del name, prefix, input_shape
    return ConvDec(nb_features=nb_features, nb_levels=nb_levels,
                   conv_size=conv_size, nb_labels=nb_labels,
                   feat_mult=feat_mult, pool_size=pool_size,
                   use_skip_connections=use_skip_connections, padding=padding,
                   dilation_rate_mult=dilation_rate_mult,
                   activation=activation, use_residuals=use_residuals,
                   final_pred_activation=final_pred_activation,
                   nb_conv_per_level=nb_conv_per_level,
                   layer_nb_feats=layer_nb_feats, batch_norm=batch_norm,
                   conv_dropout=conv_dropout)


def add_prior(input_model=None, prior_shape=None, name='prior_model',
              prefix=None, use_logp=True, final_pred_activation='softmax',
              add_prior_layer_reg=0):
    """Build an AddPrior head module (ref `models.py:378-435` knob set)."""
    del input_model, prior_shape, name, prefix, add_prior_layer_reg
    return AddPrior(use_logp=use_logp,
                    final_pred_activation=final_pred_activation)
