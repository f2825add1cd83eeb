"""Fused-MI routing re-audit in context (VERDICT r4 #7).

The fused Pallas soft-quantize + joint-histogram kernel (`ops/mi_hist.py`)
measured 1.4x standalone in r2, but its only in-context evaluation predates
the custom-call blast radius fix. This times a REGISTRATION-style step at
128^3 — warp a moving volume by a trainable bounded displacement field,
MI loss against a fixed volume, adam on the field — with the loss routed
through `MutualInformation.volumes` (jnp/MXU histogram) vs
`volumes_fused` (Pallas stream). Device-side scan chains.

Usage: python benchmarks/mi_context.py
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from benchmarks._timing import step_chain_ms  # noqa: E402
from neurite_tpu.utils import spatial  # noqa: E402

SIZE = 128


def registration_step_ms(fused, size=SIZE, reps=3):
    rng = np.random.default_rng(0)
    moving = jnp.asarray(rng.normal(size=(1, size, size, size, 1)),
                         jnp.float32)
    fixed = jnp.asarray(rng.normal(size=(1, size, size, size, 1)),
                        jnp.float32)
    field0 = jnp.zeros((1, size, size, size, 3), jnp.float32)
    mi = ne.metrics.MutualInformation(nb_bins=16, check_input_limits=False)
    tx = optax.adam(1e-2)

    def loss(field):
        # bounded warp on the production window engine (the synthesis/
        # registration hot path); clip keeps the window contract rigorous
        f = jnp.clip(field, -3., 3.)
        warped = spatial.batch_transform(moving, f, impl='window',
                                         max_disp=3.0)
        if fused:
            return -jnp.mean(mi.volumes_fused(warped, fixed))
        return -jnp.mean(mi.volumes(warped, fixed))

    opt0 = tx.init(field0)

    def step(carry, i, mv):
        field, opt = carry
        lval, g = jax.value_and_grad(loss)(
            field + 0. * mv.ravel()[i % 8])     # i-perturbation: no dedup
        upd, opt = tx.update(g, opt, field)
        return (optax.apply_updates(field, upd), opt)

    ms = step_chain_ms(step, (field0, opt0), n=4, reps=reps, args=(moving,))
    return ms


if __name__ == '__main__':
    for fused in (False, True):
        ms = registration_step_ms(fused)
        name = 'volumes_fused' if fused else 'volumes (jnp)'
        print(f'MI registration step 128^3, {name:14s}: {ms:7.2f} ms',
              flush=True)
