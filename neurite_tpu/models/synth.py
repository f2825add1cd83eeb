"""
On-device label-map -> image synthesis (SynthMorph/Brainstorm-style) and the
SynthStrip composite model.

Capability parity with reference `neurite/tf/models.py`
(`labels_to_image:649-917`, `labels_to_image_new:920-1301`,
`SynthStrip:1888-1965`), re-designed TPU-first:

- ONE jitted function per generator — the whole pipeline (affine draw, SVF
  Perlin noise, scaling-and-squaring integration, nearest warp, per-label
  intensity draw, bias, noise, blur, thick slices, gamma) compiles to a
  single XLA program with static shapes;
- the voxelmorph layers the reference imports (`models.py:760,1058`) are
  implemented natively in `neurite_tpu.utils.spatial`;
- the reference's `seeds` dict becomes named PRNG streams: every random
  component derives its key by folding a stable component name into the base
  key, and `seeds={name: int}` pins specific components for synchronization
  across model instances (pop-and-assert-empty semantics preserved,
  ref `models.py:1066-1071,1300`).
"""

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.layers.local import LocalParamLayer  # noqa: F401 (re-export convenience)
from neurite_tpu.layers.random import GaussianBlur, GaussianNoise, Subsample
from neurite_tpu.models.unet import UNet as _UNet
from neurite_tpu.utils import augment as aug
from neurite_tpu.utils import core, spatial


_COMPONENTS_NEW = ('shift', 'rot', 'scale', 'shear', 'flip', 'swap', 'warp',
                   'crop', 'mean', 'bias', 'noise', 'background', 'blur',
                   'slice', 'gamma')
_COMPONENTS_V1 = ('warp', 'mean', 'std', 'noise', 'background', 'blur',
                  'bias', 'gamma', 'dc_offset')


def _component_keys(base_key, names, seeds):
    """Derive one key per named random component; `seeds` pins components."""
    if seeds is None:
        seeds = {}
    if isinstance(seeds, tuple):
        seeds = dict(seeds)
    elif isinstance(seeds, str):
        seeds = {seeds: abs(hash(seeds)) % (2 ** 31)}
    elif not isinstance(seeds, dict):
        seeds = {f: abs(hash(f)) % (2 ** 31) for f in seeds}
    else:
        seeds = dict(seeds)
    keys = {}
    for i, name in enumerate(names):
        if name in seeds:
            keys[name] = jax.random.PRNGKey(int(seeds.pop(name)))
        else:
            keys[name] = jax.random.fold_in(base_key, i)
    assert not seeds, f'unknown seeds {seeds}'
    return keys


class LabelsToImage(nn.Module):
    """
    Modern synthesis pipeline (labels_to_image_new). Call with an integer
    label map [B, *in_shape, 1]; returns a dict with keys among
    'image', 'map', 'vel', 'def', 'aff', 'mean', 'bias' per the return_*
    flags.

    Parity: reference `neurite/tf/models.py:920-1301` — same stage order:
    affine (draw params -> matrix -> origin/center/half-res algebra ->
    flip/swap) -> dense shift -> Perlin SVF -> VecInt -> rescale -> compose
    -> ONE nearest-neighbor warp -> random crop -> generation-label LUT ->
    per-label mean draw/gather -> Perlin bias -> noise -> zero-background ->
    blur -> thick slices -> minmax+gamma -> output LUT/one-hot.
    """
    labels_in: Any
    labels_out: Optional[Any] = None
    out_shape: Optional[Sequence[int]] = None
    num_chan: int = 1
    aff_shift: float = 0
    aff_rotate: float = 0
    aff_scale: float = 0
    aff_shear: float = 0
    aff_normal_shift: bool = False
    aff_normal_rotate: bool = False
    aff_normal_scale: bool = False
    aff_normal_shear: bool = False
    axes_flip: bool = False
    axes_swap: bool = False
    warp_min: float = 0.01
    warp_max: float = 2
    warp_blur_min: Any = (8, 8)
    warp_blur_max: Any = (32, 32)
    warp_zero_mean: bool = False
    crop_min: float = 0
    crop_max: float = 0.2
    crop_prob: float = 0
    crop_axes: Optional[Any] = None
    mean_min: Optional[Sequence[float]] = None
    mean_max: Optional[Sequence[float]] = None
    noise_min: float = 0.1
    noise_max: float = 0.2
    zero_background: float = 0
    blur_min: Any = 0
    blur_max: Any = 1
    bias_min: float = 0.01
    bias_max: float = 0.1
    bias_blur_min: float = 32
    bias_blur_max: float = 64
    bias_func: Callable = jnp.exp
    slice_stride_min: float = 1
    slice_stride_max: float = 8
    slice_prob: float = 0
    slice_axes: Optional[Any] = None
    normalize: bool = True
    gamma: float = 0.5
    one_hot: bool = True
    half_res: bool = False
    # SVF integration warp engine — the drawn velocity field is CLIPPED to
    # +-warp_max_disp per axis (default 4*warp_max, a >=4-sigma tail), which
    # makes the integrated SVF provably bounded by warp_max_disp and every
    # engine below exact (and bit-comparable) on the clipped field.
    # 'window' = the Pallas v2 VPU kernel via the window engine
    # (guard='none' — the per-step bound is rigorous) on TPU;
    # 'onehot' = the block-windowed one-hot MXU engine
    # (ops.warp.interpn_onehot); 'auto' picks between those per backend
    # (measured: benchmarks/synth_impls.py); 'gather' = the
    # reference-identical XLA gather chain
    warp_impl: str = 'auto'
    # bound on the integrated SVF per axis at its NATIVE (integration)
    # resolution, ENFORCED by clipping the drawn velocity field — when not
    # half_res the label warp's window is automatically doubled to cover
    # the x2 rescale to full res
    warp_max_disp: Optional[float] = None
    # final nearest label warp: 'auto' = on TPU the Pallas v2 window kernel
    # gathering label VALUES (exact for nearest; translation/flip-only
    # affine with the shift bound folded into the window), else the bf16
    # one-hot MXU engine whenever statically eligible (3-D, labels < 256;
    # measured 5.3x the gather at 128^3, exact — benchmarks/label_warp.py),
    # else gather; 'window'/'onehot'/'gather' force one path
    label_warp_impl: str = 'auto'
    seeds: Any = None
    return_im: bool = True
    return_map: bool = True
    return_vel: bool = False
    return_def: bool = False
    return_aff: bool = False
    return_mean: bool = False
    return_bias: bool = False

    @nn.compact
    def __call__(self, labels, key=None):
        if key is None:
            key = self.make_rng('augment')
        keys = _component_keys(key, _COMPONENTS_NEW, self.seeds)
        compute_type = jnp.float32
        integer_type = jnp.int32

        in_shape = np.asarray(labels.shape[1:-1])
        out_shape = self.out_shape
        if out_shape is None:
            out_shape = in_shape
        out_shape = np.array(out_shape) // (2 if self.half_res else 1)
        num_dim = len(in_shape)
        batch_size = labels.shape[0]
        outputs = {}

        # --- affine transform (per batch item) -----------------------------
        def draw_affine(item_keys):
            ks, kr, kc, kh = item_keys
            shift_v, rot_v, scale_v, shear_v = [], [], [], []
            par = []
            for k, bound, n, center, use_normal in (
                    (ks, self.aff_shift, num_dim, 0., self.aff_normal_shift),
                    (kr, self.aff_rotate, 1 if num_dim == 2 else 3, 0.,
                     self.aff_normal_rotate),
                    (kc, self.aff_scale, num_dim, 0., self.aff_normal_scale),
                    (kh, self.aff_shear, 1 if num_dim == 2 else 3, 0.,
                     self.aff_normal_shear)):
                b = jnp.broadcast_to(jnp.asarray(bound, jnp.float32), (n,))
                if use_normal:
                    v = center + jax.random.truncated_normal(
                        k, -2., 2., (n,)) * (b / 2)
                else:
                    v = center + jax.random.uniform(k, (n,), minval=-1.,
                                                    maxval=1.) * b
                par.append(v)
            return jnp.concatenate(par)

        item_keys = [jax.random.split(keys[n], batch_size)
                     for n in ('shift', 'rot', 'scale', 'shear')]
        parameters = jax.vmap(lambda a, b, c, d: draw_affine((a, b, c, d)))(
            *item_keys)
        affine = jax.vmap(lambda p: spatial.params_to_affine_matrix(
            par=p, ndims=num_dim, deg=True, shift_scale=True,
            last_row=True))(parameters)
        outputs['aff'] = affine

        # origin/center/half-res algebra (numpy consts, ref :1107-1117)
        origin = np.eye(num_dim + 1)
        origin[:num_dim, -1] = -0.5 * (in_shape - 1)
        center = np.eye(num_dim + 1)
        center[:num_dim, -1] = np.round(
            0.5 * (in_shape - (2 if self.half_res else 1) * out_shape))
        scale = np.diag((*[2 if self.half_res else 1] * num_dim, 1))
        post = (origin @ center @ scale).astype(np.float32)
        pre = np.linalg.inv(origin).astype(np.float32)
        trans = jnp.einsum('ij,bjk,kl->bil', jnp.asarray(pre), affine,
                           jnp.asarray(post))

        if self.axes_flip:
            flips = jax.vmap(lambda k: spatial.draw_flip_matrix(
                k, out_shape, shift_center=False))(
                    jax.random.split(keys['flip'], batch_size))
            trans = jnp.einsum('bij,bjk->bik', trans, flips)
        if self.axes_swap:
            assert all(x == out_shape[0] for x in out_shape), \
                'non-isotropic output shape'
            swaps = jax.vmap(lambda k: spatial.draw_swap_matrix(k, num_dim))(
                jax.random.split(keys['swap'], batch_size))
            trans = jnp.einsum('bij,bjk->bik', trans, swaps)

        # dense shift per item
        dense_trans = jax.vmap(lambda m: spatial.affine_to_dense_shift(
            m[:num_dim], tuple(int(s) for s in out_shape),
            shift_center=False))(trans)

        # --- diffeomorphic deformation --------------------------------------
        vel_field = None
        def_field = None
        if self.warp_max > 0:
            vel_shape = (*(out_shape // (1 if self.half_res else 2)), num_dim)
            vel_keys = jax.random.split(keys['warp'], batch_size)
            vel_field = jax.vmap(lambda k: aug.draw_perlin_full(
                vel_shape, noise_min=self.warp_min, noise_max=self.warp_max,
                isotropic=False,
                fwhm_min=np.asarray(self.warp_blur_min) / 2,
                fwhm_max=np.asarray(self.warp_blur_max) / 2,
                batched=False, featured=True, reduce=jnp.max,
                dtype=compute_type, axes=[len(vel_shape) - 1],
                seed=k))(vel_keys)
            if self.warp_zero_mean:
                vel_field = vel_field - jnp.mean(
                    vel_field, axis=tuple(range(1, num_dim + 1)),
                    keepdims=True)
            wdisp = (self.warp_max_disp if self.warp_max_disp is not None
                     else 4. * float(self.warp_max))
            # ENFORCE the bound at the draw: |v| <= wdisp makes the
            # per-step scaling-and-squaring window bound rigorous (by
            # induction |v_i| <= wdisp * 2^(i-n), so the integrated SVF
            # itself is <= wdisp) — every engine sees the same clipped
            # field, so gather/onehot/window stay bit-comparable and the
            # former Gaussian-tail caveat is gone. Clipping a >=4-sigma
            # tail (the default bound is 4*warp_max) is statistically
            # invisible in the augmentation distribution.
            vel_field = jnp.clip(vel_field, -wdisp, wdisp)
            # 'auto' picks a block-windowed MXU/VPU engine for 3-D: inside
            # the fused synth+train program the gather chain serializes the
            # schedule — onehot integration + onehot label warp measured
            # 99.2ms/step vs 192.2ms with gather integration (docs/DESIGN.md);
            # on TPU the Pallas v2 window kernel beats onehot for the
            # small-channel vel field (benchmarks/synth_impls.py). 'gather'
            # forces the reference-identical gather chain.
            wimpl = self.warp_impl
            if wimpl == 'auto' and num_dim == 3:
                from neurite_tpu import backend
                wimpl = 'window' if backend.is_tpu() else 'onehot'
            if num_dim == 3 and wimpl in ('onehot', 'window'):
                # batch folded into the engine's block scan (the engine must
                # NOT be vmapped: see batch_transform)
                def_field = spatial.batch_integrate_vec(
                    vel_field, nb_steps=5, impl=wimpl, max_disp=wdisp)
            else:
                def_field = jax.vmap(
                    lambda v: spatial.integrate_vec(v, nb_steps=5))(vel_field)
            if not self.half_res:
                def_field = jax.vmap(
                    lambda d: spatial.rescale_dense_transform(d, 2))(def_field)
                # enforce the FULL-RES bound where it is consumed: the x2
                # rescale doubles displacement values past the native-res
                # clip, while the label/image warp windows are sized by
                # wdisp_l (the DEFAULT 4*warp_max carries ~4x margin over
                # typical integrated amplitudes, so this clip only touches
                # the same rare tail) — clipping keeps the static windows
                # rigorous and every engine bit-comparable
                wdisp_l_full = (2. * self.warp_max_disp
                                if self.warp_max_disp is not None
                                else 4. * float(self.warp_max))
                def_field = jnp.clip(def_field, -wdisp_l_full, wdisp_l_full)
            # affine ∘ SVF composition: the warped "volume" of the reference's
            # dense-compose is an exactly-affine field, so the gather warp
            # (the most expensive synthesis op) collapses to the closed form
            # in compose_affine_dense — identical values, no gather
            trans_dense = jax.vmap(
                lambda m, d: spatial.compose_affine_dense(
                    m[:num_dim], d, tuple(int(s) for s in out_shape)))(
                        trans, def_field)
        else:
            trans_dense = dense_trans
        outputs['vel'] = vel_field
        outputs['def'] = def_field

        # --- apply transform: ONE nearest warp ------------------------------
        # With warp_impl='onehot' and a translation/flip-only affine (the
        # per-block dynamic windows of the one-hot engine absorb arbitrary
        # global shifts and axis reversals; rotation/scale/shear would grow
        # the source window with the 128-lane x extent), the label warp rides
        # the MXU in bf16 — EXACT for 0/1 nearest weights over label values
        # < 256 — instead of XLA's scattered gather (measured ~3x on v5e).
        labels_vals = (self.labels_in if not isinstance(self.labels_in, dict)
                       else self.labels_in.keys())
        # per-axis (sequence) bounds are valid draw configs — reduce to the
        # max before comparing (a bare `bound == 0` is ambiguous for arrays
        # and silently False for tuples)
        rot_b = float(np.max(self.aff_rotate))
        scale_b = float(np.max(self.aff_scale))
        shear_b = float(np.max(self.aff_shear))
        aff_bounded = (rot_b == 0 and scale_b == 0 and shear_b == 0
                       and not self.axes_swap and not self.half_res)
        base_ok = (num_dim == 3 and max(labels_vals) < 256
                   and not self.axes_swap and not self.half_res)
        # rotation/scale/shear need the shear-decomposed engine (the plain
        # engine's (z, y) window would grow with the 128-lane x extent);
        # the small-angle window bounds hold to ~30 deg / 0.3
        eligible = base_ok and aff_bounded
        shear_eligible = (base_ok and not aff_bounded
                          and rot_b <= 30. and scale_b <= 0.3
                          and shear_b <= 0.3)
        if self.label_warp_impl == 'onehot':
            assert eligible or shear_eligible, (
                "label_warp_impl='onehot' needs 3-D labels < 256, no axis "
                'swap/half_res, and rotation/scale/shear within 30deg/0.3 '
                "(beyond that the source windows blow up); use 'auto'")
        if self.label_warp_impl == 'window':
            assert eligible and not self.axes_flip, (
                "label_warp_impl='window' needs 3-D labels, no axis "
                'swap/flip/half_res, and a translation-only affine (static '
                "windows don't absorb rotation/scale/shear or z/y axis "
                "reversals); use 'auto'")
        route = self.label_warp_impl in ('auto', 'onehot', 'window')
        # warp_max_disp bounds the integrated SVF at its NATIVE (integration)
        # resolution; when not half_res the field is rescale_dense_transform'd
        # x2 before the full-res label warp, doubling displacement magnitudes
        # — so a tight USER-supplied bound must be doubled for the label-warp
        # window or out-of-window points would clamp to wrong labels (ADVICE
        # r1). The 4*warp_max DEFAULT already carries ~4x margin over the
        # integrated amplitude, so it covers the x2 rescale as-is — doubling
        # it too would only grow the window (measured +7ms on config #5).
        # Either way the full-res field is CLIPPED to this same bound at the
        # rescale above, so the windows are rigorous, not just probable.
        rescale_fac = 1. if self.half_res else 2.
        wdisp_l = (rescale_fac * self.warp_max_disp
                   if self.warp_max_disp is not None
                   else (4. * float(self.warp_max)
                         if self.warp_max > 0 else 1.0))
        labels = labels.astype(compute_type)
        if eligible and route:
            from neurite_tpu import backend
            # the Pallas v2 window kernel gathers label VALUES directly
            # (exact for nearest — no one-hot needed), but its windows are
            # STATIC: a global translation is NOT absorbed (the one-hot
            # engine's dynamic block starts do), so the drawn shift bound
            # folds into the window size instead
            shift_b = float(np.max(self.aff_shift))
            use_window = (self.label_warp_impl == 'window'
                          or (self.label_warp_impl == 'auto'
                              and backend.is_tpu() and shift_b <= 8.
                              and not self.axes_flip))
            if use_window:
                labels = spatial.batch_transform(
                    labels, trans_dense, interp_method='nearest',
                    fill_value=0, impl='window',
                    max_disp=wdisp_l + shift_b, guard='none')
            else:
                labels = spatial.batch_transform(
                    labels, trans_dense, interp_method='nearest',
                    fill_value=0, impl='onehot', max_disp=wdisp_l,
                    matmul_dtype=jnp.bfloat16)
        elif shear_eligible and self.label_warp_impl == 'onehot':
            # measured a wash vs gather in the fused program (103.6 vs
            # 101.8ms, benchmarks/synth_train.py SYNTH_ROTATED=1) — the
            # unconditionally-exact gather stays the rotated default and
            # the shear engine is the explicit opt-in
            from neurite_tpu.ops import warp as warp_ops
            mesh = core.volshape_to_ndgrid(
                tuple(int(s) for s in out_shape), dtype=jnp.int32)
            grid = jnp.stack([m.astype(trans_dense.dtype) for m in mesh], -1)
            labels = warp_ops.interpn_shear_onehot(
                labels[..., 0] if labels.shape[-1] == 1 else labels,
                trans, grid[None] + trans_dense,
                max_disp=warp_ops.shear_window_disp(
                    (8, 8), rot_b, scale_b, shear_b, wdisp_l),
                max_shear=warp_ops.shear_bound(rot_b, scale_b, shear_b),
                fill_value=0, matmul_dtype=jnp.bfloat16)
            if labels.ndim == num_dim + 1:
                labels = labels[..., None]
        else:
            labels = spatial.batch_transform(labels, trans_dense,
                                             interp_method='nearest',
                                             fill_value=0)
        labels = labels.astype(integer_type)

        # --- cropping --------------------------------------------------------
        if self.crop_prob > 0:
            mask = aug.draw_crop_mask(
                labels.astype(compute_type), crop_min=self.crop_min,
                crop_max=self.crop_max,
                axis=(list(self.crop_axes) if self.crop_axes is not None
                      else list(range(1, num_dim + 1))),
                prob=self.crop_prob, bilateral=False, seed=keys['crop'])
            labels = (labels.astype(compute_type) * mask).astype(integer_type)

        # --- generation labels ------------------------------------------------
        labels_in = self.labels_in
        if not isinstance(labels_in, dict):
            labels_in = {int(i): int(i) for i in labels_in}
        labels_gen = list(dict.fromkeys(labels_in.values()))
        ind = {gen: i for i, gen in enumerate(labels_gen)}
        lut = np.asarray([ind.get(labels_in.get(i), 0)
                          for i in range(max(labels_in) + 1)], np.int32)
        indices = jnp.take(jnp.asarray(lut), labels, mode='clip')

        # --- intensity means --------------------------------------------------
        num_label = len(labels_gen)
        mean_min = np.asarray([0] * num_label if self.mean_min is None
                              else self.mean_min, np.float32)
        mean_max = np.asarray([1] * num_label if self.mean_max is None
                              else self.mean_max, np.float32)
        u = jax.random.uniform(keys['mean'],
                               (batch_size, self.num_chan, num_label),
                               dtype=compute_type)
        mean = mean_min + u * (mean_max - mean_min)
        outputs['mean'] = mean

        off_chan = jnp.arange(self.num_chan, dtype=integer_type) * num_label
        off_batch = (jnp.arange(batch_size, dtype=integer_type) *
                     self.num_chan * num_label)
        idx_full = indices + off_batch.reshape(-1, *[1] * num_dim, 1) + off_chan
        image = jnp.take(mean.reshape(-1), idx_full, mode='clip')

        # --- bias field -------------------------------------------------------
        bias_field = None
        if self.bias_max > 0:
            bias_keys = jax.random.split(keys['bias'], batch_size)
            bshape = (*image.shape[1:-1], image.shape[-1])
            bias_field = jax.vmap(lambda k: aug.draw_perlin_full(
                bshape, noise_min=self.bias_min, noise_max=self.bias_max,
                isotropic=False,
                fwhm_min=self.bias_blur_min / (2 if self.half_res else 1),
                fwhm_max=self.bias_blur_max / (2 if self.half_res else 1),
                batched=False, featured=True, reduce=jnp.max,
                dtype=compute_type, seed=k))(bias_keys)
            bias_field = self.bias_func(bias_field)
            image = image * bias_field
        outputs['bias'] = bias_field

        # --- noise ------------------------------------------------------------
        image = GaussianNoise(noise_min=self.noise_min,
                              noise_max=self.noise_max,
                              name='noise')(image, key=keys['noise'])

        # --- background clearing ----------------------------------------------
        if self.zero_background > 0:
            bg_rand = jax.random.uniform(
                keys['background'], (batch_size, *[1] * num_dim, 1),
                dtype=compute_type)
            bg_zero = jnp.logical_and(labels == 0,
                                      bg_rand < self.zero_background)
            image = image * jnp.logical_not(bg_zero).astype(compute_type)

        # --- blur --------------------------------------------------------------
        image = GaussianBlur(sigma=self.blur_max, min_sigma=self.blur_min,
                             random=True, name='blur')(image,
                                                       key=keys['blur'])

        # --- thick slices --------------------------------------------------------
        if self.slice_prob > 0:
            image = Subsample(
                prob=self.slice_prob,
                stride_min=max(1, self.slice_stride_min /
                               (2 if self.half_res else 1)),
                stride_max=max(1, self.slice_stride_max /
                               (2 if self.half_res else 1)),
                axes=self.slice_axes, name='slice')(image, key=keys['slice'])

        # --- intensity manipulations ----------------------------------------------
        if self.normalize:
            image = jax.vmap(core.minmax_norm)(image)
        if self.gamma > 0:
            assert 0 < self.gamma < 1, \
                f'gamma value {self.gamma} outside interval [0, 1)'
            g = jax.random.uniform(
                keys['gamma'], (batch_size, *[1] * num_dim, self.num_chan),
                minval=1 - self.gamma, maxval=1 + self.gamma,
                dtype=image.dtype)
            image = jnp.power(image, g)
        outputs['image'] = image

        # --- output labels -----------------------------------------------------
        out_lut_src = (list(labels_in) if self.labels_out is None
                       else self.labels_out)
        if not isinstance(out_lut_src, dict):
            out_lut_src = {int(i): int(i) for i in out_lut_src}
        labels_out_set = list(dict.fromkeys(out_lut_src.values()))

        lut_map = dict(out_lut_src)
        if self.one_hot:
            ind_out = {out: i for i, out in enumerate(labels_out_set)}
            lut_map = {inp: ind_out[out] for inp, out in lut_map.items()}

        if any(k != lut_map[k] for k in lut_map) or \
                set(labels_in) - set(lut_map):
            lut_arr = np.asarray(
                [lut_map.get(i, -1 if self.one_hot else 0)
                 for i in range(max(labels_in) + 1)], np.int32)
            labels = jnp.asarray(lut_arr)[jnp.clip(labels, 0,
                                                   len(lut_arr) - 1)]

        if self.one_hot:
            labels = jax.nn.one_hot(labels[..., 0], len(labels_out_set),
                                    dtype=compute_type)
        outputs['map'] = labels

        wanted = [('image', self.return_im), ('map', self.return_map),
                  ('vel', self.return_vel), ('def', self.return_def),
                  ('aff', self.return_aff), ('mean', self.return_mean),
                  ('bias', self.return_bias)]
        return {k: outputs[k] for k, w in wanted if w}


class LabelsToImageV1(nn.Module):
    """
    Legacy Brainstorm-style synthesis (deprecated in the reference but used
    by SynthStrip). Per-label mean AND std draws, interpolation-based Perlin
    SVF/bias, clip to [0,255], log-normal gamma, DC offset.

    Parity: reference `neurite/tf/models.py:649-917`.
    """
    in_label_list: Any
    out_label_list: Optional[Any] = None
    out_shape: Optional[Sequence[int]] = None
    num_chan: int = 1
    mean_min: Optional[Sequence[float]] = None
    mean_max: Optional[Sequence[float]] = None
    std_min: Optional[Sequence[float]] = None
    std_max: Optional[Sequence[float]] = None
    zero_background: float = 0.2
    warp_res: Any = (16,)
    warp_std: float = 0.5
    warp_modulate: bool = True
    bias_res: Any = 40
    bias_std: float = 0.3
    bias_modulate: bool = True
    blur_std: float = 1
    blur_modulate: bool = True
    normalize: bool = True
    gamma_std: float = 0.25
    dc_offset: float = 0
    one_hot: bool = True
    seeds: Any = None
    return_vel: bool = False
    return_def: bool = False

    @nn.compact
    def __call__(self, labels, key=None):
        if key is None:
            key = self.make_rng('augment')
        keys = _component_keys(key, _COMPONENTS_V1, self.seeds)

        in_shape = np.asarray(labels.shape[1:-1])
        out_shape = in_shape if self.out_shape is None \
            else np.asarray(self.out_shape)
        num_dim = len(in_shape)
        batch_size = labels.shape[0]

        if not jnp.issubdtype(labels.dtype, jnp.integer):
            labels = labels.astype(jnp.int32)

        # rebase into [0, N)
        in_label_list = np.int32(np.unique(np.asarray(self.in_label_list)))
        num_in_labels = len(in_label_list)
        in_lut = np.zeros(np.max(in_label_list) + 1, np.int32)
        for i, lab in enumerate(in_label_list):
            in_lut[lab] = i
        labels = jnp.take(jnp.asarray(in_lut), labels, mode='clip')

        vel_field = None
        def_field = None
        if self.warp_std > 0:
            vel_shape = (*(out_shape // 2), num_dim)
            vel_scale = np.asarray(self.warp_res) / 2
            vel_keys = jax.random.split(keys['warp'], batch_size)
            vel_field = jax.vmap(lambda k: aug.draw_perlin(
                vel_shape, scales=list(vel_scale),
                min_std=0 if self.warp_modulate else self.warp_std,
                max_std=self.warp_std, seed=k))(vel_keys)
            def_field = jax.vmap(
                lambda v: spatial.integrate_vec(v, nb_steps=5))(vel_field)
            def_field = def_field * 2  # RescaleValues(2) (ref :804)
            def_field = jax.vmap(lambda d: core.resize(
                d, [2] * num_dim))(def_field)  # Resize(2) (ref :805)
            labels = spatial.batch_transform(
                labels.astype(jnp.float32), def_field,
                interp_method='nearest', fill_value=0)
        labels = labels.astype(jnp.int32)

        # per-label mean/std draws
        mean_min = np.asarray([0] + [25] * (num_in_labels - 1)
                              if self.mean_min is None else self.mean_min,
                              np.float32)
        mean_max = np.asarray([225] * num_in_labels
                              if self.mean_max is None else self.mean_max,
                              np.float32)
        std_min = np.asarray([0] + [5] * (num_in_labels - 1)
                             if self.std_min is None else self.std_min,
                             np.float32)
        std_max = np.asarray([25] * num_in_labels
                             if self.std_max is None else self.std_max,
                             np.float32)
        u = jax.random.uniform(keys['mean'],
                               (batch_size, self.num_chan, num_in_labels))
        mean = mean_min + u * (mean_max - mean_min)
        u = jax.random.uniform(keys['std'],
                               (batch_size, self.num_chan, num_in_labels))
        std = std_min + u * (std_max - std_min)

        noise = jax.random.normal(keys['noise'],
                                  (*labels.shape[:-1], self.num_chan))
        indices = jnp.concatenate(
            [labels + i * num_in_labels for i in range(self.num_chan)], -1)
        mean_vox = jax.vmap(lambda m, i: jnp.take(m.reshape(-1), i,
                                                  mode='clip'))(mean, indices)
        std_vox = jax.vmap(lambda s, i: jnp.take(s.reshape(-1), i,
                                                 mode='clip'))(std, indices)
        image = noise * std_vox + mean_vox

        if self.zero_background > 0:
            rand_flip = jax.random.uniform(
                keys['background'],
                (batch_size, *[1] * num_dim, self.num_chan))
            rand_flip = rand_flip < self.zero_background
            image = image * (1. - jnp.logical_and(labels == 0,
                                                  rand_flip).astype(image.dtype))

        if self.blur_std > 0:
            kernels = core.gaussian_kernel(
                [self.blur_std] * num_dim, separate=True,
                random=self.blur_modulate, dtype=image.dtype,
                seed=keys['blur'] if self.blur_modulate else None)
            if not isinstance(kernels, list):
                kernels = [kernels]
            image = core.separable_conv(image, kernels, batched=True)

        if self.bias_std > 0:
            bias_shape = (*out_shape, 1)
            bias_keys = jax.random.split(keys['bias'], batch_size)
            bias_field = jax.vmap(lambda k: aug.draw_perlin(
                bias_shape, scales=self.bias_res,
                min_std=0 if self.bias_modulate else self.bias_std,
                max_std=self.bias_std, seed=k))(bias_keys)
            image = image * jnp.exp(bias_field)

        image = jnp.clip(image, 0, 255)
        if self.normalize:
            image = jax.vmap(core.minmax_norm)(image)
        if self.gamma_std > 0:
            g = self.gamma_std * jax.random.normal(
                keys['gamma'], (batch_size, *[1] * num_dim, self.num_chan))
            image = jnp.power(image, jnp.exp(g))
        if self.dc_offset > 0:
            image = image + jax.random.uniform(
                keys['dc_offset'],
                (batch_size, *[1] * num_dim, self.num_chan),
                maxval=self.dc_offset)

        # output LUT
        out_label_list = self.out_label_list
        if out_label_list is None:
            out_label_list = in_label_list
        if isinstance(out_label_list, (tuple, list, np.ndarray)):
            out_label_list = {int(lab): int(lab) for lab in out_label_list}
        out_lut = np.zeros(num_in_labels, np.int32)
        for i, lab in enumerate(in_label_list):
            if lab in out_label_list:
                out_lut[i] = out_label_list[lab]

        if self.one_hot:
            hot_label_list = np.unique(list(out_label_list.values()))
            hot_lut = np.full(hot_label_list[-1] + 1, -1, np.int32)
            for i, lab in enumerate(hot_label_list):
                hot_lut[lab] = i
            out_lut = hot_lut[out_lut]

        labels = jnp.take(jnp.asarray(out_lut), labels, mode='clip')
        if self.one_hot:
            labels = jax.nn.one_hot(labels[..., 0], len(hot_label_list))

        outputs = {'image': image, 'map': labels}
        if self.return_vel:
            outputs['vel'] = vel_field
        if self.return_def:
            outputs['def'] = def_field
        return outputs


class SynthStripModule(nn.Module):
    """
    SynthStrip: on-device synthesis (v1 generator, one_hot=False) -> UNet
    (linear final activation) -> concat(unet_out, synth_labels) so the loss
    sees ground truth.

    Parity: reference `neurite/tf/models.py:1888-1965`.
    """
    labels_in: Any
    labels_out: Any
    nb_unet_features: Any = None
    nb_unet_levels: Optional[int] = None
    unet_feat_mult: float = 1
    nb_unet_conv_per_level: int = 1
    src_feats: int = 1
    gen_args: Any = None

    @nn.compact
    def __call__(self, labels, key=None, training=False):
        ndims = labels.ndim - 2
        assert ndims in (1, 2, 3), \
            f'ndims should be one of 1, 2, or 3. found: {ndims}'
        gen_args = dict(self.gen_args or {})
        gen = LabelsToImageV1(in_label_list=self.labels_in,
                              out_label_list=self.labels_out,
                              one_hot=False, return_def=False,
                              name='gen', **gen_args)
        out = gen(labels, key=key)
        synth_image, synth_labels = out['image'], out['map']

        nb_feats = self.nb_unet_features
        nb_levels = self.nb_unet_levels
        strip = _UNet(
            nb_features=nb_feats,
            nb_levels=(None if isinstance(nb_feats, (list, tuple))
                       else nb_levels),
            conv_size=3, nb_labels=1, feat_mult=self.unet_feat_mult,
            nb_conv_per_level=self.nb_unet_conv_per_level,
            final_pred_activation='linear', name='unet')
        pred = strip(synth_image, training=training)

        return jnp.concatenate([pred, synth_labels.astype(jnp.float32)],
                               axis=-1)


def labels_to_image_new(labels_in, labels_out=None, in_shape=None,
                        out_shape=None, input_model=None, **kwargs):
    """Build a LabelsToImage module (ref `models.py:920-1301` knob set)."""
    del in_shape, input_model
    kwargs.pop('id', None)
    for k in ('mean_min', 'mean_max', 'warp_blur_min', 'warp_blur_max',
              'blur_min', 'blur_max', 'slice_axes', 'crop_axes'):
        if k in kwargs and isinstance(kwargs[k], (list, np.ndarray)):
            kwargs[k] = tuple(np.ravel(kwargs[k]).tolist())
    if isinstance(kwargs.get('seeds'), dict):
        kwargs['seeds'] = tuple(sorted(kwargs['seeds'].items()))
    if isinstance(labels_in, (list, np.ndarray)):
        labels_in = tuple(int(v) for v in labels_in)
    elif isinstance(labels_in, dict):
        labels_in = dict(labels_in)
    if isinstance(labels_out, (list, np.ndarray)):
        labels_out = tuple(int(v) for v in labels_out)
    if out_shape is not None:
        out_shape = tuple(int(v) for v in out_shape)
    return LabelsToImage(labels_in=labels_in, labels_out=labels_out,
                         out_shape=out_shape, **kwargs)


def labels_to_image(in_shape, in_label_list, out_label_list=None,
                    out_shape=None, num_chan=1, input_model=None, **kwargs):
    """Build the legacy generator (ref `models.py:649-917` knob set)."""
    del in_shape, input_model
    kwargs.pop('id', None)
    for k in ('mean_min', 'mean_max', 'std_min', 'std_max', 'warp_res'):
        if k in kwargs and isinstance(kwargs[k], (list, np.ndarray)):
            kwargs[k] = tuple(np.ravel(kwargs[k]).tolist())
    if isinstance(kwargs.get('seeds'), dict):
        kwargs['seeds'] = tuple(sorted(kwargs['seeds'].items()))
    if isinstance(in_label_list, (list, np.ndarray)):
        in_label_list = tuple(int(v) for v in in_label_list)
    if isinstance(out_label_list, (list, np.ndarray)):
        out_label_list = tuple(int(v) for v in out_label_list)
    if out_shape is not None:
        out_shape = tuple(int(v) for v in out_shape)
    return LabelsToImageV1(in_label_list=in_label_list,
                           out_label_list=out_label_list,
                           out_shape=out_shape, num_chan=num_chan, **kwargs)


def SynthStrip(inshape, labels_in, labels_out, nb_unet_features=None,
               nb_unet_levels=None, unet_feat_mult=1,
               nb_unet_conv_per_level=1, src_feats=1, gen_args=None):
    """Build a SynthStrip module (ref `models.py:1888-1965` knob set)."""
    del inshape
    return SynthStripModule(labels_in=labels_in, labels_out=labels_out,
                            nb_unet_features=nb_unet_features,
                            nb_unet_levels=nb_unet_levels,
                            unet_feat_mult=unet_feat_mult,
                            nb_unet_conv_per_level=nb_unet_conv_per_level,
                            src_feats=src_feats,
                            gen_args=tuple(sorted((gen_args or {}).items())))
