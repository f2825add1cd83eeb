"""Config-#3 step decomposition: how much of the 113.2ms is trunk vs head?

Measures three jitted train steps at the lc_head.py shape (160^3, bf16):
  trunk : the hourglass alone (no LC head)
  head  : LC head alone on a precomputed 4-channel trunk output
  full  : trunk + head (the benchmarks/lc_head.py config)

The split directs optimization: if trunk-only is already > the 60ms
target, a faster LC kernel alone cannot reach it.
"""
import os
import sys
import time

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
pdt = jnp.bfloat16


def trunk_module():
    return ne.models.unet(nb_features=8, input_shape=(size,) * 3 + (1,),
                          nb_levels=3, conv_size=3, nb_labels=4,
                          feat_mult=2, final_pred_activation='linear',
                          dtype=jnp.bfloat16, conv_impl='auto', name='trunk')


class TrunkOnly(nn.Module):
    @nn.compact
    def __call__(self, x, training=False):
        return trunk_module()(x, training=training)


class HeadOnly(nn.Module):
    @nn.compact
    def __call__(self, x, training=False):
        return ne.layers.LocallyConnected3D(
            filters=1, kernel_size=3, padding='same', param_dtype=pdt,
            name='lc')(x)


class Full(nn.Module):
    @nn.compact
    def __call__(self, x, training=False):
        y = trunk_module()(x, training=training)
        return ne.layers.LocallyConnected3D(
            filters=1, kernel_size=3, padding='same', param_dtype=pdt,
            name='lc')(y)


def bench(name, model, x, y):
    t0 = time.time()
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-4))
    step = jax.jit(training.make_train_step(
        lambda yt, yp: jnp.mean((yt - yp.astype(jnp.float32)) ** 2)),
        donate_argnums=(0,))
    state, m = step(state, (x, y), jax.random.PRNGKey(1))
    jax.block_until_ready(m['loss'])
    compile_s = time.time() - t0
    outs = []
    for n in (3, 13):
        t0 = time.time()
        s, mm = state, m
        for i in range(n):
            s, mm = step(s, (x, y), jax.random.PRNGKey(i))
        jax.block_until_ready(mm['loss'])
        outs.append(time.time() - t0)
        state = s
    ms = (outs[1] - outs[0]) / 10 * 1e3
    print(f'{name:6s}: {ms:7.1f} ms/step (compile+first {compile_s:.0f}s)',
          flush=True)


rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
x4 = jnp.asarray(rng.normal(size=(1, size, size, size, 4)), jnp.float32)
y1 = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
y4 = jnp.asarray(rng.normal(size=(1, size, size, size, 4)), jnp.float32)

which = sys.argv[1:] or ['trunk', 'head', 'full']
for name in which:
    if name == 'trunk':
        bench('trunk', TrunkOnly(), x1, y4)
    elif name == 'head':
        bench('head', HeadOnly(), x4, y1)
    elif name == 'full':
        bench('full', Full(), x1, y1)
    else:
        raise SystemExit(f'unknown variant {name}')
