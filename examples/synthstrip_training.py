"""
Example: SynthStrip-style brain extraction trained purely on synthetic data
(reference `neurite/tf/models.py:1888-1965`): an on-device label-map ->
image generator feeds a stripping UNet; the model output concatenates the
prediction with the synthesized ground truth so the loss needs no labels.

Run: python examples/synthstrip_training.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training


def main():
    size, nb_gen_labels = 32, 6
    model = ne.models.SynthStrip(
        inshape=(size, size), labels_in=list(range(nb_gen_labels)),
        labels_out=[1, 2],                 # brain labels to strip to
        nb_unet_features=8, nb_unet_levels=3)

    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, nb_gen_labels,
                                      size=(2, size, size, 1)), jnp.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)

    def loss_fn(_, out):
        pred, truth = out[..., :1], out[..., 1:]
        # soft Dice between sigmoid(pred) and the synthesized brain mask
        p = jax.nn.sigmoid(pred)
        top = 2 * jnp.sum(p * truth, axis=(1, 2, 3))
        bot = jnp.sum(p * p, axis=(1, 2, 3)) + jnp.sum(truth * truth,
                                                       axis=(1, 2, 3))
        return -jnp.mean(top / jnp.maximum(bot, 1e-7))

    state = training.create_train_state(
        model, {'params': jax.random.PRNGKey(0),
                'augment': jax.random.PRNGKey(1)}, labels, optax.adam(1e-3))
    step = jax.jit(training.make_train_step(
        loss_fn, rng_names=('dropout', 'augment')))
    for i in range(10):
        state, metrics = step(state, (labels, labels), jax.random.PRNGKey(i))
        if i % 3 == 0:
            print(f'step {i}: loss {float(metrics["loss"]):.4f}')
    return {'loss': float(metrics['loss'])}


if __name__ == '__main__':
    main()
