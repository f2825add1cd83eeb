"""
Example: pairwise deformable registration (SVF, MI loss) — CPU-runnable.

Shows the framework's voxelmorph-adjacent pieces (SURVEY §2.4: VecInt /
transform / affine algebra live in `neurite_tpu.utils.spatial`) composing
into a classic optimization-based registration:

    phi = exp(v)  (scaling & squaring),  moved = moving o phi,
    loss = -MI(moved, fixed) + lambda * |grad v|^2

On TPU the warp inside the optimization loop rides the windowed one-hot
MXU engines (`interpn`); the MI metric uses the fused soft-quantize +
joint-histogram path. Run: python examples/deformable_registration.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu.utils import spatial


def make_pair(size=32, key=0):
    """Synthetic moving/fixed pair: a blob warped by a known smooth field."""
    rng = np.random.default_rng(key)
    grid = np.stack(np.meshgrid(*[np.arange(size)] * 2, indexing='ij'), -1)
    c1, c2 = size * 0.45, size * 0.55
    moving = np.exp(-((grid[..., 0] - c1) ** 2
                      + (grid[..., 1] - c1) ** 2) / (size * 0.8))
    fixed = np.exp(-((grid[..., 0] - c2) ** 2
                     + (grid[..., 1] - c2) ** 2) / (size * 1.2))
    moving += 0.02 * rng.normal(size=moving.shape)
    fixed += 0.02 * rng.normal(size=fixed.shape)
    return (jnp.asarray(moving, jnp.float32)[..., None],
            jnp.asarray(fixed, jnp.float32)[..., None])


def grad_l2(v):
    """Smoothness penalty: mean squared forward differences of the SVF."""
    loss = 0.
    for ax in range(v.ndim - 1):
        d = jnp.diff(v, axis=ax)
        loss = loss + jnp.mean(d * d)
    return loss


def main():
    size = 32
    moving, fixed = make_pair(size)
    mi = ne.metrics.MutualInformation(nb_bins=16)

    def register_loss(vel):
        disp = spatial.integrate_vec(vel, nb_steps=5)
        moved = spatial.transform(moving, disp)
        mi_val = mi.volumes(moved[None], fixed[None])[0]
        return -mi_val + 0.05 * grad_l2(vel), mi_val

    vel = jnp.zeros((size, size, 2), jnp.float32)
    tx = optax.adam(0.5)
    opt_state = tx.init(vel)
    step = jax.jit(lambda v, s: _update(v, s, register_loss, tx))

    mi0 = float(register_loss(vel)[1])
    for i in range(60):
        vel, opt_state, mi_val = step(vel, opt_state)
    mi1 = float(mi_val)
    print(f'MI before {mi0:.4f} -> after {mi1:.4f} '
          f'(disp max {float(jnp.abs(spatial.integrate_vec(vel, 5)).max()):.2f} vox)')
    assert mi1 > mi0 + 0.05, 'registration failed to improve MI'
    print('OK')
    return {'mi_before': float(mi0), 'mi_after': float(mi1)}


def _update(vel, opt_state, loss_fn, tx):
    (loss, mi_val), g = jax.value_and_grad(loss_fn, has_aux=True)(vel)
    updates, opt_state = tx.update(g, opt_state, vel)
    return optax.apply_updates(vel, updates), opt_state, mi_val


if __name__ == '__main__':
    main()
