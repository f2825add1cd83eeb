"""Device profile of the config-#5 fused synth+train step (VERDICT r4
item 1): which ops hold the 45ms, now that the custom-call blast radius is
gone (benchmarks/blur_context4.py measured off/split/identity at
15.5/15.4/15.0ms — the +430% degraded mode no longer reproduces on this
runtime).

Prints the top XLA ops by device time via benchmarks/trace_ops.py.
SYNTH_ONLY=1 profiles the synthesis forward alone.
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
from neurite_tpu import training  # noqa: E402
from benchmarks.trace_ops import profile_top_ops  # noqa: E402


def main():
    size, nb_labels = 128, 16
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(nb_labels)), out_shape=(size,) * 3,
        one_hot=True)
    labels = jnp.asarray(np.random.default_rng(0).integers(
        0, nb_labels, size=(1, size, size, size, 1)), jnp.int32)
    gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                                  'augment': jax.random.PRNGKey(1)}, labels)

    if os.environ.get('SYNTH_ONLY'):
        fwd = jax.jit(lambda lab, key: gen.apply(
            gen_vars, lab, rngs={'augment': key})['image'])
        jax.block_until_ready(fwd(labels, jax.random.PRNGKey(0)))
        profile_top_ops(
            lambda i: fwd(labels, jax.random.PRNGKey(i)), steps=5, top=40)
        return

    unet = ne.models.unet(nb_features=16, input_shape=(size,) * 3 + (1,),
                          nb_levels=4, conv_size=3, nb_labels=nb_labels,
                          feat_mult=2, nb_conv_per_level=2,
                          dtype=jnp.bfloat16, conv_impl='auto')
    state = training.create_train_state(
        unet, jax.random.PRNGKey(0),
        jnp.zeros((1,) + (size,) * 3 + (1,)), optax.adam(1e-3))
    loss = ne.losses.SoftDice(check_input_limits=False).loss
    base_step = training.make_train_step(loss)

    @jax.jit
    def synth_step(state, labels, key):
        out = gen.apply(gen_vars, labels, rngs={'augment': key})
        return base_step(state, (out['image'], out['map']), key)

    state, m = synth_step(state, labels, jax.random.PRNGKey(2))
    jax.block_until_ready(m['loss'])

    holder = {'state': state}

    def one(i):
        holder['state'], m = synth_step(holder['state'], labels,
                                        jax.random.PRNGKey(10 + i))
        return m['loss']

    profile_top_ops(one, steps=5, top=40)


if __name__ == '__main__':
    main()
