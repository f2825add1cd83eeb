"""
Example: train a 2-D UNet segmenter on synthetic label maps (CPU-runnable).

The minimum end-to-end slice (BASELINE.md config #1): model builder + soft
Dice loss + jitted train step + fit driver with callbacks.

Run: python examples/train_unet_2d.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training


def batches(key, size=64, nb_labels=4, batch=8):
    """Infinite synthetic (image, one-hot labels) batches."""
    rng = np.random.default_rng(0)
    while True:
        labels = rng.integers(0, nb_labels, size=(batch, size, size))
        image = labels[..., None] + 0.1 * rng.normal(
            size=(batch, size, size, 1))
        yield {'x': jnp.asarray(image, jnp.float32),
               'y': jax.nn.one_hot(jnp.asarray(labels), nb_labels)}


def main():
    size, nb_labels = 64, 4
    model = ne.models.unet(nb_features=8, input_shape=(size, size, 1),
                           nb_levels=3, conv_size=3, nb_labels=nb_labels,
                           feat_mult=2, nb_conv_per_level=2)

    data = batches(jax.random.PRNGKey(0), size, nb_labels)
    state = training.create_train_state(
        model, jax.random.PRNGKey(0), next(data)['x'], optax.adam(1e-3))

    step = training.make_train_step(
        ne.losses.SoftDice(check_input_limits=False).loss)
    state, history = training.fit(
        state, step, data, nb_steps=100, rng=jax.random.PRNGKey(1),
        callbacks=[ne.callbacks.ModelWeightCheck(),
                   ne.callbacks.CheckLossTrend(),
                   ne.callbacks.TimeHistory()],
        log_every=20)
    print('final loss:', history[-1]['loss'])
    return {'final_loss': float(history[-1]['loss'])}


if __name__ == '__main__':
    main()
