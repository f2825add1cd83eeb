"""s2d quality validation at flagship scale (VERDICT r4 item 6).

Trains the parity UNet (s2d=1) and the space-to-depth variants (s2d=2, 4)
on the SAME on-device synthetic segmentation task at 128^3 — fresh
labels_to_image_new samples per step, soft-Dice loss — to a fixed step
budget, then evaluates mean soft-Dice on a held-out set of fixed synthesis
keys. Records steps/sec so the equal-WALL-CLOCK comparison is readable from
the same table (s2d trains ~3-10x more steps per second).

S2D_STEPS=N (default 300) sets the budget; S2D_WHICH='1 2 4' selects runs.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402

size, nb_labels = 128, 16
steps = int(os.environ.get('S2D_STEPS', 300))
which = [int(s) for s in os.environ.get('S2D_WHICH', '1 2 4').split()]

gen = ne.models.labels_to_image_new(
    labels_in=list(range(nb_labels)), out_shape=(size,) * 3, one_hot=True)
labels = jnp.asarray(np.random.default_rng(0).integers(
    0, nb_labels, size=(1, size, size, size, 1)), jnp.int32)
gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                              'augment': jax.random.PRNGKey(1)}, labels)
loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
EVAL_KEYS = [jax.random.PRNGKey(10_000 + k) for k in range(4)]


def run(s2d):
    nb_levels = 4 if s2d <= 2 else 3
    model = ne.models.unet(
        nb_features=16, input_shape=(size,) * 3 + (1,), nb_levels=nb_levels,
        conv_size=3, nb_labels=nb_labels, feat_mult=2, nb_conv_per_level=2,
        dtype=jnp.bfloat16, conv_impl='auto',
        **({'space_to_depth': s2d} if s2d > 1 else {}))
    state = training.create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1,) + (size,) * 3 + (1,)),
        optax.adam(1e-3))
    base_step = training.make_train_step(loss_fn)

    @jax.jit
    def synth_step(state, labels, key):
        out = gen.apply(gen_vars, labels, rngs={'augment': key})
        return base_step(state, (out['image'], out['map']), key)

    @jax.jit
    def eval_loss(state, labels, key):
        out = gen.apply(gen_vars, labels, rngs={'augment': key})
        pred = state.apply_fn({'params': state.params}, out['image'],
                              training=False)
        return loss_fn(out['map'], pred)

    state, m = synth_step(state, labels, jax.random.PRNGKey(1))
    _ = float(m['loss'])
    t0 = time.time()
    for i in range(steps):
        state, m = synth_step(state, labels, jax.random.PRNGKey(100 + i))
    lN = float(m['loss'])
    wall = time.time() - t0
    ev = float(np.mean([float(eval_loss(state, labels, k))
                        for k in EVAL_KEYS]))
    print(f's2d={s2d}: {steps} steps in {wall:.1f}s '
          f'({steps / wall:.1f} steps/s), final train soft-Dice {lN:.4f}, '
          f'held-out soft-Dice {ev:.4f}', flush=True)


for s in which:
    run(s)
