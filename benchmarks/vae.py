"""Microbenchmark: BASELINE config #4 — anatomical-priors-style conv VAE
at 128^3 (conv_enc -> VAE bottleneck with SampleNormalLogVar -> conv_dec,
ref `models.py:249-646`)."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training

size = 128
model = ne.models.ae(nb_features=8, input_shape=(size,) * 3 + (1,),
                     nb_levels=4, conv_size=3, nb_labels=1,
                     enc_size=(8, 8, 8, 16), ae_type='conv', do_vae=True,
                     feat_mult=2, single_model=True,
                     final_pred_activation='linear', dtype=jnp.bfloat16)

x = jnp.asarray(np.random.default_rng(0).normal(
    size=(1, size, size, size, 1)), jnp.float32)

t0 = time.time()
state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                    optax.adam(1e-4))
step = jax.jit(training.make_train_step(
    lambda yt, yp: jnp.mean((yt - yp.astype(jnp.float32)) ** 2),
    rng_names=('dropout', 'sample')), donate_argnums=(0,))
state, m = step(state, (x, x), jax.random.PRNGKey(1))
print(f'compile+first {time.time()-t0:.0f}s loss {float(m["loss"]):.4f}',
      flush=True)


def run(n, state):
    t0 = time.time()
    for i in range(n):
        state, m = step(state, (x, x), jax.random.PRNGKey(2 + i))
    _ = float(m['loss'])
    return time.time() - t0, state


t1, state = run(3, state)
t2, state = run(13, state)
dt = (t2 - t1) / 10
print(f'VAE train step {dt*1000:.1f} ms -> {1/dt:.2f} vol/s/chip', flush=True)


if __name__ == '__main__' and not os.environ.get('VAE_SKIP_SPARSE'):
    # config #4 as defined: the SpatiallySparse_Dense imputation path
    from benchmarks.vae_sparse import sparse_vae_step_ms
    t0 = time.time()
    ms = sparse_vae_step_ms()
    print(f'Sparse-imputation VAE (SSD encode+decode, d=128, D=128^3): '
          f'{ms:.1f} ms/step -> {1000/ms:.2f} vol/s/chip '
          f'(wall incl. compile {time.time()-t0:.0f}s)', flush=True)
