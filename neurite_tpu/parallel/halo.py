"""
Explicit spatial sharding with halo exchange — the volumetric counterpart of
sequence/context parallelism (SURVEY.md §5.7).

The reference's only big-volume strategy is host-side patch+quilt
(`neurite/tf/generators.py:265-341`, `tf/utils/seg.py:363-374`). Here the
volume's spatial axis is sharded across the mesh 'space' axis and convolution
halos travel over ICI via `lax.ppermute` — neighbor-wise exchange overlapped
with per-shard compute, exactly the ring-attention/CP communication pattern
mapped to 3-D volumes. GSPMD (`mesh.make_sharded_train_step`) does this
automatically for whole models; this module is the explicit `shard_map` form
for custom kernels and for composing distributed reductions.
"""

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from neurite_tpu.parallel.mesh import SPACE_AXIS


def halo_exchange(x, halo, axis, axis_name=SPACE_AXIS, boundary='zero'):
    """
    Concatenate `halo`-wide neighbor slabs onto both ends of `axis`.

    Runs inside shard_map over `axis_name`. Global-edge shards get zero
    (boundary='zero', matching SAME-conv zero padding) or their own edge
    value (boundary='edge') in place of the wrapped slab.

    Returns the locally-padded array (local_len + 2*halo along `axis`).
    """
    if halo == 0:
        return x
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert x.shape[axis] >= halo, \
        f'halo {halo} exceeds local extent {x.shape[axis]}'

    def slab(start, size):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(start, start + size) if start >= 0 \
            else slice(x.shape[axis] + start, None)
        return x[tuple(sl)]

    # send my right edge to my right neighbor (it becomes their left halo)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(slab(-halo, halo), axis_name, fwd)
    from_right = jax.lax.ppermute(slab(0, halo), axis_name, bwd)

    if boundary == 'zero':
        from_left = jnp.where(idx == 0, 0., from_left)
        from_right = jnp.where(idx == n - 1, 0., from_right)
    elif boundary == 'edge':
        from_left = jnp.where(idx == 0, slab(0, halo), from_left)
        from_right = jnp.where(idx == n - 1, slab(-halo, halo), from_right)
    else:
        raise ValueError(f'unknown boundary {boundary}')
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def sharded_conv(x, kernel, mesh, sharded_axis=1, axis_name=SPACE_AXIS):
    """
    SAME-padding N-D convolution of a batch [B, *spatial, C] whose
    `sharded_axis` is sharded over the mesh `axis_name`: halo-exchange the
    kernel radius over ICI, then convolve each shard VALID along that axis —
    bitwise equal to the unsharded SAME conv (parity-tested on a CPU mesh).

    kernel: [*k_spatial, C_in, C_out] (replicated).
    """
    ndims = kernel.ndim - 2
    k_ax = kernel.shape[sharded_axis - 1]
    assert k_ax % 2 == 1, \
        'even kernel size on the sharded axis is not supported'
    halo = (k_ax - 1) // 2
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape,
        ('N' + 'DHW'[-ndims:] + 'C', 'DHW'[-ndims:] + 'IO',
         'N' + 'DHW'[-ndims:] + 'C'))
    pads = []
    for d in range(ndims):
        k = kernel.shape[d]
        if d == sharded_axis - 1:
            pads.append((0, 0))                       # VALID on padded axis
        else:
            pads.append(((k - 1) // 2, k // 2))       # SAME elsewhere

    def local(xs, ker):
        xs = halo_exchange(xs, halo, sharded_axis, axis_name)
        return jax.lax.conv_general_dilated(
            xs, ker, window_strides=(1,) * ndims, padding=pads,
            dimension_numbers=dn)

    spec = [None] * x.ndim
    spec[sharded_axis] = axis_name
    in_spec = P(*spec)
    f = shard_map(local, mesh=mesh, in_specs=(in_spec, P()),
                  out_specs=in_spec)
    return f(x, kernel)


def sharded_separable_blur(x, kernels_1d, mesh, sharded_axis=1,
                           axis_name=SPACE_AXIS):
    """
    Separable Gaussian blur of [B, *spatial, C] with one 1-D kernel per
    spatial axis, the `sharded_axis` dimension sharded over the mesh: halos
    only for the pass along the sharded axis, plain SAME convs elsewhere.
    """
    ndims = len(kernels_1d)
    out = x
    for d, k1 in enumerate(kernels_1d):
        k1 = jnp.asarray(k1)
        kshape = [1] * ndims + [1, 1]
        kshape[d] = k1.shape[0]
        cin = out.shape[-1]
        ker = jnp.tile(k1.reshape(kshape), [1] * ndims + [1, cin])
        # depthwise: feature_group_count = C
        dn = jax.lax.conv_dimension_numbers(
            out.shape, ker.shape,
            ('N' + 'DHW'[-ndims:] + 'C', 'DHW'[-ndims:] + 'IO',
             'N' + 'DHW'[-ndims:] + 'C'))
        ax = d + 1
        if ax == sharded_axis:
            halo = (k1.shape[0] - 1) // 2
            assert k1.shape[0] % 2 == 1, \
                'sharded-axis blur kernels must be odd-sized'
            pads = [((kk - 1) // 2, kk // 2) if i != d else (0, 0)
                    for i, kk in enumerate(
                        [ker.shape[j] for j in range(ndims)])]

            def local(xs, kk):
                xs = halo_exchange(xs, halo, ax, axis_name)
                return jax.lax.conv_general_dilated(
                    xs, kk, window_strides=(1,) * ndims, padding=pads,
                    dimension_numbers=dn, feature_group_count=cin)

            spec = [None] * out.ndim
            spec[sharded_axis] = axis_name
            in_spec = P(*spec)
            out = shard_map(local, mesh=mesh, in_specs=(in_spec, P()),
                            out_specs=in_spec)(out, ker)
        else:
            pads = [((kk - 1) // 2, kk // 2)
                    for kk in [ker.shape[j] for j in range(ndims)]]
            spec = [None] * out.ndim
            spec[sharded_axis] = axis_name
            in_spec = P(*spec)
            out = shard_map(
                functools.partial(
                    jax.lax.conv_general_dilated,
                    window_strides=(1,) * ndims, padding=pads,
                    dimension_numbers=dn, feature_group_count=cin),
                mesh=mesh, in_specs=(in_spec, P()),
                out_specs=in_spec)(out, ker)
    return out


def sharded_lc(x, kernel, kernel_size, mesh, padding='same',
               impl='tap', interpret=False, axis_name=SPACE_AXIS):
    """
    Spatially-sharded locally-connected conv (the config-#3 head, scaled
    across chips; VERDICT r4 #5 / reference `neurite/tf/layers.py:811-1532`).

    A locally-connected layer has PER-VOXEL weights, so sharding the volume's
    z axis shards the weight tensor with it — each chip holds exactly the
    kernel rows of its own output voxels (447M params / n chips at the 160^3
    head) and the only communication is the (k-1)//2-plane activation halo
    over ICI. This is the natural multi-chip form of the LC head: tensor
    contractions stay local, weights are never replicated, and the backward's
    dk lands on the chip that owns those weights (dx halos travel via the
    transposed ppermute that shard_map derives).

    x: [B, D, H, W, C], z sharded over `axis_name`.
    kernel: transposed layout [O, prod(k)*C, D, H*W] — the flat-V kernel of
      `ops.lc_tap` reshaped so z is an explicit, shardable axis; shard it
      P(None, None, axis_name, None).
    impl: 'tap' = XLA transposed tap sum (`ops.lc_tap`) per shard — always
      compiles; 'pallas' = the v2 Pallas kernel (`ops.pallas_lc2`) per
      shard with its V axis sharded by construction (each device runs the
      proven single-chip kernel on its own slab; this is the multi-device
      route around the 160^3 pure-XLA remote-compile crash, docs/DESIGN.md
      config #3). `interpret=True` drives the Pallas path on CPU.
    Returns [B, D, H, W, O] (float32), z sharded, bitwise equal to the
    unsharded `lc_transposed` (parity-tested on the CPU mesh).
    """
    from neurite_tpu.ops import lc_tap

    assert padding == 'same', 'sharded_lc supports SAME padding only'
    kz = kernel_size[0]
    assert kz % 2 == 1, 'even z kernels are not supported under sharding'
    halo = (kz - 1) // 2
    ndims = len(kernel_size)

    def local(xs, ks_):
        xs = halo_exchange(xs, halo, 1, axis_name)    # SAME zeros at edges
        if impl == 'pallas':
            # the Pallas kernel computes SAME on the halo-extended slab;
            # its z pads land OUTSIDE the halo rows, whose outputs are
            # sliced off below, so interior windows read only real rows.
            # The kernel tensor gains `halo` zero weight planes per side
            # (their dk is discarded by the pad transpose).
            from neurite_tpu.ops import pallas_lc2
            kp = jnp.pad(ks_, ((0, 0), (0, 0), (halo, halo), (0, 0)))
            kflat = kp.reshape(kp.shape[0], kp.shape[1], -1)
            y = pallas_lc2.lc_transposed_pallas(
                xs, kflat, tuple(kernel_size), interpret)  # [B, Dp, H, W, O]
            return y[:, halo:y.shape[1] - halo]
        # y/x axes keep SAME pads; z is now VALID over the halo-padded slab
        pads = [(0, 0), (0, 0)]
        for d in range(1, ndims):
            total = kernel_size[d] - 1
            pads.append((total // 2, total - total // 2))
        pads.append((0, 0))
        xs = jnp.pad(xs, pads)
        kflat = ks_.reshape(ks_.shape[0], ks_.shape[1], -1)
        y = lc_tap.lc_transposed(xs, kflat, tuple(kernel_size), 'valid')
        return y

    xspec = P(None, axis_name, *([None] * (x.ndim - 2)))
    kspec = P(None, None, axis_name, None)
    kw = {}
    if impl == 'pallas':
        # pallas_call cannot annotate varying-mesh-axes on its out_shape;
        # disable the vma check for this wrapper (newer jax only)
        import inspect
        if 'check_vma' in inspect.signature(shard_map).parameters:
            kw['check_vma'] = False
    f = shard_map(local, mesh=mesh, in_specs=(xspec, kspec),
                  out_specs=xspec, **kw)
    return f(x, kernel)


def sharded_dice_sums(y_true, y_pred, mesh, sharded_axis=1,
                      axis_name=SPACE_AXIS):
    """
    Distributed Dice partial sums over a spatially-sharded batch
    [B, *spatial, L]: each shard reduces its voxels locally, one psum over
    ICI merges them (SURVEY.md §5.8 — the Dice numerator/denominator are
    shard-wise partial sums + one collective).

    Returns (sum_xy, sum_xx, sum_yy), each [B, L], replicated.
    """
    def local(t, p):
        tf = t.reshape(t.shape[0], -1, t.shape[-1])
        pf = p.reshape(p.shape[0], -1, p.shape[-1])
        s_xy = jnp.sum(tf * pf, 1)
        s_tt = jnp.sum(tf * tf, 1)
        s_pp = jnp.sum(pf * pf, 1)
        return tuple(jax.lax.psum(s, axis_name)
                     for s in (s_xy, s_tt, s_pp))

    spec = [None] * y_true.ndim
    spec[sharded_axis] = axis_name
    in_spec = P(*spec)
    return shard_map(local, mesh=mesh, in_specs=(in_spec, in_spec),
                     out_specs=(P(), P(), P()))(y_true, y_pred)


def sharded_bounded_warp(vol, loc_shift, mesh, max_disp=8.0,
                         interp_method='linear', fill_value=None,
                         impl='onehot', matmul_dtype=None,
                         axis_name=SPACE_AXIS):
    """
    Warp a batch of 3-D volumes whose z axis is sharded over the mesh
    `axis_name` by a bounded displacement field: out(x) = vol(x + shift(x)),
    |shift| <= max_disp per axis.

    The distributed form of the one-hot warp engine (SURVEY §5.7/§5.8):
    each shard halo-exchanges a ceil(max_disp)+1 slab of source rows over
    ICI (`lax.ppermute` inside `halo_exchange`), then warps its own output
    rows entirely from local+halo data — neighbor-wise communication
    overlapped with per-shard MXU work, the context-parallel pattern in
    volume form. Matches the unsharded warp exactly for in-bound fields:
    global-edge clipping reproduces because clipped z coordinates never
    reach the fabricated halo rows (clip happens against the *global*
    extent before localization).

    vol: [B, D, H, W] or [B, D, H, W, C], z sharded; loc_shift:
    [B, D, H, W, 3] displacements (z component in *global* voxel units),
    sharded the same way.
    """
    import numpy as np
    from neurite_tpu.ops import warp as warp_ops
    from neurite_tpu.utils import core

    n_space = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    has_c = vol.ndim == 5
    halo = int(np.ceil(float(max_disp))) + 1
    d_global = vol.shape[1]
    local_len = d_global // n_space
    assert d_global % n_space == 0, (d_global, n_space)
    assert halo <= local_len, \
        f'halo {halo} exceeds local z extent {local_len}'

    def local(v, s):
        idx = jax.lax.axis_index(axis_name)
        z_off = (idx * local_len).astype(jnp.float32)
        vp = halo_exchange(v, halo, 1, axis_name)
        # global sample coordinates for this shard's output rows
        zl, yl, xl = [g.astype(jnp.float32)
                      for g in core.volshape_to_ndgrid(s.shape[1:-1])]
        loc_z = jnp.clip(zl[None] + z_off + s[..., 0], 0., d_global - 1.)
        loc_z = loc_z - z_off + halo          # into the halo-padded shard
        loc = jnp.stack([loc_z, yl[None] + s[..., 1], xl[None] + s[..., 2]],
                        -1)
        if impl == 'onehot':
            out = warp_ops.interpn_onehot(
                vp, loc, interp_method=interp_method, max_disp=max_disp + 1,
                matmul_dtype=matmul_dtype)
        else:
            out = jax.vmap(lambda vv, ll: core.interpn(
                vv, ll, interp_method=interp_method))(vp, loc)
        if fill_value is not None:
            glob = jnp.stack([zl[None] + z_off + s[..., 0],
                              yl[None] + s[..., 1], xl[None] + s[..., 2]], -1)
            maxl = jnp.asarray([d_global - 1., s.shape[2] - 1.,
                                s.shape[3] - 1.], jnp.float32)
            oob = jnp.any((glob < 0.) | (glob > maxl), axis=-1)
            if has_c:
                oob = oob[..., None]
            out = jnp.where(oob, jnp.asarray(fill_value, out.dtype), out)
        return out

    vspec = P(None, axis_name, None, None, None) if has_c \
        else P(None, axis_name, None, None)
    sspec = P(None, axis_name, None, None, None)
    f = shard_map(local, mesh=mesh, in_specs=(vspec, sspec),
                  out_specs=vspec)
    return f(vol, loc_shift)
