"""Microbenchmark: BASELINE config #3 — conv encoder-decoder with a
LocallyConnected3D head at 160^3 (the reference's flagship "native"
component, `layers.py:811-1532`).

LC_PARAM_DTYPE=bfloat16 measures the halved-weight-bandwidth variant.
"""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training

size = 160
pdt = {'float32': jnp.float32,
       'bfloat16': jnp.bfloat16}[os.environ.get('LC_PARAM_DTYPE', 'float32')]


class EncDecLC(nn.Module):
    """Small hourglass trunk + LocallyConnected3D head (config #3 shape)."""

    @nn.compact
    def __call__(self, x, training=False):
        u = ne.models.unet(nb_features=8, input_shape=(size,) * 3 + (1,),
                           nb_levels=3, conv_size=3, nb_labels=4,
                           feat_mult=2, final_pred_activation='linear',
                           dtype=jnp.bfloat16, conv_impl='auto', name='trunk')
        y = u(x, training=training)
        y = ne.layers.LocallyConnected3D(
            filters=1, kernel_size=3, padding='same', param_dtype=pdt,
            name='lc')(y)
        return y


model = EncDecLC()
x = jnp.asarray(np.random.default_rng(0).normal(
    size=(1, size, size, size, 1)), jnp.float32)
y = jnp.asarray(np.random.default_rng(1).normal(
    size=(1, size, size, size, 1)), jnp.float32)

t0 = time.time()
state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                    optax.adam(1e-4))
n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
step = jax.jit(training.make_train_step(
    lambda yt, yp: jnp.mean((yt - yp.astype(jnp.float32)) ** 2)),
    donate_argnums=(0,))
state, m = step(state, (x, y), jax.random.PRNGKey(1))
print(f'compile+first {time.time()-t0:.0f}s  params {n_par/1e6:.0f}M  '
      f'loss {float(m["loss"]):.4f}', flush=True)


def run(n, state):
    t0 = time.time()
    for i in range(n):
        state, m = step(state, (x, y), jax.random.PRNGKey(2 + i))
    _ = float(m['loss'])
    return time.time() - t0, state


t1, state = run(3, state)
t2, state = run(13, state)
dt = (t2 - t1) / 10
print(f'LC-head train step {dt*1000:.1f} ms (param_dtype={pdt.__name__})',
      flush=True)
