"""Microbenchmark: the Pallas locally-connected kernel (ops/pallas_lc.py)
alone vs the XLA per-tap form, at the 160^3 head's shapes (V=4.096M, C=4,
k=3^3, bf16 weights). Times fwd and fwd+bwd with the two-point fit.

Run on TPU. LC_MICRO_SIZE=128 shrinks the volume.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.layers.local import _lc_per_tap
from neurite_tpu.ops import pallas_lc

size = int(os.environ.get('LC_MICRO_SIZE', 160))
C = 4
ks = (3, 3, 3)
D = H = W = size
V = D * H * W
K = 27 * C

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(V, C)), jnp.bfloat16)
k2 = jnp.asarray(rng.normal(size=(V, K)), jnp.bfloat16)
g = jnp.asarray(rng.normal(size=(V, 1)), jnp.float32)


def fit(step, args, n1=3, n2=13):
    """
    Two-point fit of one step. `step(*state) -> state` threads its output
    back as input so chained applications can't be CSE'd or overlapped away.
    """
    def chain(n):
        @jax.jit
        def c(*a):
            for _ in range(n):
                a = step(*a)
            return a
        return c
    ts = []
    for n in (n1, n2):
        cfn = chain(n)
        r = cfn(*args)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])  # compile+sync
        t0 = time.time()
        r = cfn(*args)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.time() - t0)
    return (ts[1] - ts[0]) / (n2 - n1)


def pal_fwd(x, k2):
    y = pallas_lc.lc3d_pallas(x, k2, (D, H, W), ks)
    return x + (y * 1e-6).astype(x.dtype), k2


def pal_grad(x, k2):
    def loss(x, k2):
        return jnp.sum(pallas_lc.lc3d_pallas(x, k2, (D, H, W), ks) * g)
    dx, dk = jax.grad(loss, argnums=(0, 1))(x, k2)
    return x + (dx * 1e-6).astype(x.dtype), k2 + (dk * 1e-6).astype(k2.dtype)


def _xla_fwd_val(x, k2):
    y, _ = _lc_per_tap(x.reshape(1, D, H, W, C), k2.reshape(V, K, 1),
                       ks, (1, 1, 1), 'same', 1)
    return y.reshape(V, 1)


def xla_fwd(x, k2):
    y = _xla_fwd_val(x, k2)
    return x + (y * 1e-6).astype(x.dtype), k2


def xla_grad(x, k2):
    def loss(x, k2):
        return jnp.sum(_xla_fwd_val(x, k2) * g)
    dx, dk = jax.grad(loss, argnums=(0, 1))(x, k2)
    return x + (dx * 1e-6).astype(x.dtype), k2 + (dk * 1e-6).astype(k2.dtype)


print(f'V={V} C={C} K={K} backend={jax.default_backend()}', flush=True)
for name, fn in [('pallas fwd', pal_fwd), ('xla fwd', xla_fwd),
                 ('pallas grad', pal_grad), ('xla grad', xla_grad)]:
    try:
        dt = fit(fn, (x, k2))
        print(f'{name:12s} {dt * 1e3:8.2f} ms', flush=True)
    except Exception as e:
        print(f'{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}',
              flush=True)

# parity check on-chip (fwd)
yp = np.asarray(jax.jit(lambda x, k2: pallas_lc.lc3d_pallas(
    x, k2, (D, H, W), ks))(x, k2), np.float32)
yx = np.asarray(jax.jit(_xla_fwd_val)(x, k2), np.float32)
print('fwd max abs diff:', float(np.abs(yp - yx).max()), flush=True)
