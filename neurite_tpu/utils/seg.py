"""
Whole-volume patch-based segmentation inference ("serve" path).

Capability parity with reference `neurite/tf/utils/seg.py` (file:line cites
per function), re-designed around a jitted apply function instead of
`keras.Model.predict`: the host drives patch tiling (`neurite_tpu.io.tiling`)
and quilt reassembly, the device runs batched forward passes. The patch+quilt
decomposition is the host-level counterpart of on-device spatial sharding
(SURVEY.md §5.7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.io import tiling


def predict_volume_stack(apply_fn, data_generator, batch_size, nb_patches,
                         verbose=False):
    """
    Pull `nb_patches` worth of (input, output) patch batches from
    `data_generator`, run `apply_fn` on each input batch, and return stacked
    flat arrays (vol, true, pred) — reference `predict_volume_stack`
    (`seg.py:138-227`) with `model.predict` replaced by a jitted callable.

    `apply_fn(batch_input) -> prediction` must be ready-to-call (jit outside).
    Generator items may be (input, output) tuples or bare inputs.
    """
    vols, trues, preds = [], [], []
    done = 0
    while done < nb_patches:
        batch = next(data_generator)
        if isinstance(batch, (tuple, list)):
            x, y = batch[0], batch[1]
        else:
            x, y = batch, None
        x = np.asarray(x)
        p = np.asarray(apply_fn(jnp.asarray(x)))
        vols.append(x)
        preds.append(p)
        if y is not None:
            trues.append(np.asarray(y))
        done += x.shape[0]
        if verbose:
            print(f'predict_volume_stack: {done}/{nb_patches} patches')
    vol = np.concatenate(vols, 0)[:nb_patches]
    pred = np.concatenate(preds, 0)[:nb_patches]
    true = np.concatenate(trues, 0)[:nb_patches] if trues else None
    return vol, true, pred


def predict_volumes(apply_fn, data_generator, batch_size, patch_size,
                    patch_stride, vol_shape, nan_func='nanmedian',
                    do_extra_vol=False, do_prob_of_true=False,
                    verbose=False):
    """
    Whole-volume prediction by patches: run `apply_fn` over all patches of
    one volume, argmax to labels, and quilt-reassemble with overlap
    aggregation — reference `predict_volumes` (`seg.py:41-135`).

    Returns (vol_label_pred, vol_label_true[, vol_input, prob_of_true_pred,
    prob_of_true_true if do_extra_vol/do_prob_of_true]).
    """
    gsize = tiling.grid_size(vol_shape, patch_size, patch_stride)
    nb_patches = int(np.prod(gsize))
    vol, true, pred = predict_volume_stack(
        apply_fn, data_generator, batch_size, nb_patches, verbose=verbose)

    # labels from probabilistic patches
    pred_label_patches = pred_to_label(pred)               # [P, *patch]
    vol_label_pred = _quilt(pred_label_patches, patch_size, vol_shape,
                            patch_stride, nan_func)
    outs = [vol_label_pred]

    if true is not None:
        true_label_patches = pred_to_label(true)
        outs.append(_quilt(true_label_patches, patch_size, vol_shape,
                           patch_stride, nan_func))
    else:
        outs.append(None)

    if do_extra_vol:
        vol_in = vol[..., 0] if vol.ndim == len(patch_size) + 2 else vol
        outs.append(_quilt(vol_in, patch_size, vol_shape, patch_stride,
                           nan_func))
        if do_prob_of_true and true is not None:
            prob_patches = prob_of_label(pred, pred_to_label(true))
            outs.append(_quilt(prob_patches, patch_size, vol_shape,
                               patch_stride, nan_func))
            prob_true_patches = prob_of_label(true, pred_to_label(true))
            outs.append(_quilt(prob_true_patches, patch_size, vol_shape,
                               patch_stride, nan_func))

    return tuple(outs)


def pred_to_label(pred):
    """Argmax over the trailing label axis (ref `seg.py:296-300`)."""
    return np.argmax(np.asarray(pred), axis=-1)


def prob_of_label(vol, labelvol):
    """
    Probability each voxel assigns to a given label map: vol [..., L] indexed
    by labelvol [...] (ref `prob_of_label`, `seg.py:230-260`).
    """
    vol = np.asarray(vol)
    labelvol = np.asarray(labelvol)
    return np.take_along_axis(vol, labelvol[..., None], axis=-1)[..., 0]


def next_label(apply_fn, data_generator):
    """(true label, pred label) for the next generator batch
    (ref `next_label`, `seg.py:271-279`)."""
    batch = next(data_generator)
    x, y = batch[0], batch[1]
    pred = np.asarray(apply_fn(jnp.asarray(np.asarray(x))))
    return pred_to_label(np.asarray(y)), pred_to_label(pred)


def next_pred_label(apply_fn, data_generator):
    """(sample, true label, pred label) (ref `seg.py:263-269`)."""
    batch = next(data_generator)
    x, y = batch[0], batch[1]
    pred = np.asarray(apply_fn(jnp.asarray(np.asarray(x))))
    return x, pred_to_label(np.asarray(y)), pred_to_label(pred)


def sample_to_label(sample):
    """Label map of a probabilistic sample (ref `seg.py:282-293`)."""
    return pred_to_label(sample)


def next_vol_pred(apply_fn, data_generator):
    """(vol, prediction[, prior]) for the next batch
    (ref `next_vol_pred`, `seg.py:302-319`)."""
    batch = next(data_generator)
    if isinstance(batch[0], (tuple, list)):   # (vol, prior) input pairing
        x, prior = batch[0]
    else:
        x, prior = batch[0], None
    pred = np.asarray(apply_fn(jnp.asarray(np.asarray(x))))
    return x, pred, batch[1], prior


def recode(seg, mapping):
    """
    Remap segmentation labels through a lookup table (ref `recode`,
    `seg.py:322-356`): `mapping` is a dict {old: new} or a sequence where
    position i holds the new label for old label i. Device-friendly: one
    `jnp.take`.
    """
    seg = jnp.asarray(seg)
    if isinstance(mapping, dict):
        max_label = max(int(k) for k in mapping)
        lut = np.zeros(max_label + 1, np.int32)
        for k, v in mapping.items():
            lut[int(k)] = int(v)
    else:
        lut = np.asarray(mapping, np.int32)
    return jnp.take(jnp.asarray(lut), seg.astype(jnp.int32), mode='clip')


def _quilt(patches, patch_size, vol_shape, stride, nan_func='nanmedian'):
    """Reassemble flat patch stack into a volume (ref `_quilt`,
    `seg.py:363-374`) via `neurite_tpu.io.tiling.quilt`."""
    agg = nan_func if nan_func in ('nanmean', 'nanmedian', 'mean') \
        else 'nanmedian'
    patches = np.asarray(patches, np.float64)
    return tiling.quilt(patches, patch_size, tuple(vol_shape), stride,
                        agg=agg)


def predict_volume_device(apply_fn, vol, patch_size, stride=None,
                          agg='mean'):
    """
    Whole-volume patch inference entirely ON DEVICE: one jit-friendly
    `lax.scan` slices each patch (`dynamic_slice`), applies the model, and
    accumulates the overlap-mean quilt — no host round trip per patch
    (the reference's `predict_volumes` loop is host-driven,
    `seg.py:138-227`; this is the TPU-native serving form, composable
    under jit/pjit).

    apply_fn: [1, *patch_size, C_in] -> [1, *patch_size, C_out]
        (a jitted/traceable model apply closed over its params).
    vol: [*vol_shape, C_in]; agg: 'mean' or 'sum' overlap aggregation.
    Returns [*vol_shape, C_out].
    """
    import jax

    from neurite_tpu.io import tiling

    assert agg in ('mean', 'sum'), agg
    vol = jnp.asarray(vol)
    ndims = len(patch_size)
    assert vol.ndim == ndims + 1, (vol.shape, patch_size)
    vol_shape = vol.shape[:-1]
    axis_starts, psize = tiling.patch_starts(vol_shape, patch_size, stride)
    import itertools as _it
    starts = np.asarray(list(_it.product(*axis_starts)), np.int32)

    out_c = jax.eval_shape(
        apply_fn, jax.ShapeDtypeStruct((1, *psize, vol.shape[-1]),
                                       vol.dtype)).shape[-1]
    out_dtype = jax.eval_shape(
        apply_fn, jax.ShapeDtypeStruct((1, *psize, vol.shape[-1]),
                                       vol.dtype)).dtype

    acc = jnp.zeros((*vol_shape, out_c), out_dtype)
    cnt = jnp.zeros(vol_shape, jnp.float32)
    ones = jnp.ones(tuple(psize), jnp.float32)

    def body(carry, st):
        acc, cnt = carry
        idx = tuple(st[d] for d in range(ndims))
        patch = jax.lax.dynamic_slice(
            vol, idx + (jnp.int32(0),), (*psize, vol.shape[-1]))
        pred = apply_fn(patch[None])[0]
        cur = jax.lax.dynamic_slice(acc, idx + (jnp.int32(0),), pred.shape)
        acc = jax.lax.dynamic_update_slice(acc, cur + pred,
                                           idx + (jnp.int32(0),))
        curc = jax.lax.dynamic_slice(cnt, idx, ones.shape)
        cnt = jax.lax.dynamic_update_slice(cnt, curc + ones, idx)
        return (acc, cnt), 0

    (acc, cnt), _ = jax.lax.scan(body, (acc, cnt), jnp.asarray(starts))
    if agg == 'mean':
        acc = acc / cnt[..., None].astype(acc.dtype)
    return acc
