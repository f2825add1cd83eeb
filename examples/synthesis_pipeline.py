"""
Example: fully on-device label-map -> image synthesis (SynthMorph-style)
feeding a 3-D UNet (BASELINE.md config #5).

One jitted function runs: random affine + SVF warp, per-label intensity
draws, bias field, noise, blur, normalization — then a UNet train step on
the synthesized (image, one-hot map) pair. No host round trips.

Run: python examples/synthesis_pipeline.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training


def main():
    size, nb_labels = 32, 8          # raise to 128/16+ on a TPU chip
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(nb_labels)), out_shape=(size,) * 3,
        one_hot=True)
    unet = ne.models.unet(nb_features=8, input_shape=(size,) * 3 + (1,),
                          nb_levels=3, conv_size=3, nb_labels=nb_labels)

    labels = jnp.asarray(np.random.default_rng(0).integers(
        0, nb_labels, size=(1, size, size, size, 1)), jnp.int32)
    # jit the init: on remote-compile TPU runtimes an eager init of a
    # 128^3 synthesis graph can take minutes of per-op round trips
    gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                                  'augment': jax.random.PRNGKey(1)}, labels)
    state = training.create_train_state(
        unet, jax.random.PRNGKey(0), jnp.zeros((1,) + (size,) * 3 + (1,)),
        optax.adam(1e-3))
    loss = ne.losses.SoftDice(check_input_limits=False).loss
    base_step = training.make_train_step(loss)

    @jax.jit
    def synth_step(state, labels, key):
        out = gen.apply(gen_vars, labels, rngs={'augment': key})
        return base_step(state, (out['image'], out['map']), key)

    for i in range(10):
        state, metrics = synth_step(state, labels, jax.random.PRNGKey(i))
        print(f'step {i}: loss {float(metrics["loss"]):.4f}')
    return {'loss': float(metrics['loss'])}


if __name__ == '__main__':
    main()
