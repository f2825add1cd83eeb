"""BASELINE config #4 *as defined*: SpatiallySparse_Dense sparse-imputation
VAE at volume scale (VERDICT r4 missing #1).

Sparse-slice observation (16 of 128 z-slices), SSD encode (per-sample
masked normal-equations solve, ref `neurite/tf/layers.py:705-711`) -> VAE
bottleneck -> shared-weight SSD decode, MSE on observed voxels. d=128
latents over D=128^3 -> a 2.1M x 128 decode matrix (anatomical-priors
CVPR'18 architecture at headline scale).

Importable without side effects; `python benchmarks/vae_sparse.py` runs it.
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

SIZE = 128
LATENT = 128


class SparseVAE(nn.Module):
    shape: tuple = (SIZE, SIZE, SIZE, 1)
    latent: int = LATENT

    @nn.compact
    def __call__(self, yx, training=False):
        y, mask = yx
        ssd = ne.layers.SpatiallySparse_Dense(
            input_shape=self.shape, output_len=self.latent, name='ssd')
        z = ssd([y, mask])                       # masked solve encode
        mu = nn.Dense(self.latent, name='mu')(z)
        lv = nn.Dense(self.latent, name='logvar')(z)
        zs = ne.layers.SampleNormalLogVar(name='sample')([mu, lv])
        return ssd([zs])                          # shared-weight decode


def sparse_vae_step_ms(size=SIZE, latent=LATENT):
    from benchmarks._timing import step_chain_ms
    rng = np.random.default_rng(1)
    yv = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    mk = np.zeros((1, size, size, size, 1), np.float32)
    mk[:, ::8] = 1.                               # 16 observed z-slices
    mk = jnp.asarray(mk)
    model = SparseVAE(shape=(size, size, size, 1), latent=latent)
    st = training.create_train_state(
        model, {'params': jax.random.PRNGKey(0),
                'sample': jax.random.PRNGKey(9)}, (yv, mk), optax.adam(1e-4))
    loss = lambda yt, yp: (  # noqa: E731 - MSE on observed voxels
        jnp.sum(mk * (yt - yp.reshape(yt.shape)) ** 2) / jnp.sum(mk))
    stp = training.make_train_step(loss, rng_names=('sample',))

    def run_step(st2, i, y2, m2):
        st2, _ = stp(st2, ((y2, m2), y2),
                     jax.random.fold_in(jax.random.PRNGKey(5), i))
        return st2
    return step_chain_ms(run_step, st, n=4, reps=3, args=(yv, mk))


if __name__ == '__main__':
    t0 = time.time()
    ms = sparse_vae_step_ms()
    print(f'Sparse-imputation VAE (SSD encode+decode, d={LATENT}, '
          f'D={SIZE}^3): {ms:.1f} ms/step -> {1000/ms:.2f} vol/s/chip '
          f'(wall incl. compile {time.time()-t0:.0f}s)', flush=True)
