"""
Example: data-parallel + spatially-sharded training over a device mesh.

Without TPU pods, run on a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/multichip_training.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import parallel, training


def main():
    n = len(jax.devices())
    space = 2 if n % 2 == 0 and n > 1 else 1
    mesh = parallel.create_mesh(data=n // space, space=space)
    print('mesh:', dict(mesh.shape))

    size, nb_labels, batch = 32, 4, max(2, n // space)
    model = ne.models.unet(nb_features=8, input_shape=(size, size, 1),
                           nb_levels=3, conv_size=3, nb_labels=nb_labels)
    rng = np.random.default_rng(0)
    labels = rng.integers(0, nb_labels, size=(batch, size, size))
    x = jnp.asarray(labels[..., None], jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(labels), nb_labels)

    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))
    step = training.make_train_step(
        ne.losses.SoftDice(check_input_limits=False).loss)
    sharded = parallel.make_sharded_train_step(step, mesh)

    batch_on_mesh = parallel.shard_batch({'x': x, 'y': y}, mesh)
    for i in range(5):
        state, metrics = sharded(state, batch_on_mesh, jax.random.PRNGKey(i))
        print(f'step {i}: loss {float(metrics["loss"]):.4f}')
    return {'loss': float(metrics['loss'])}


if __name__ == '__main__':
    main()
