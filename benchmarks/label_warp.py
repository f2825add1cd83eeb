"""Microbenchmark: nearest label warp — XLA gather vs one-hot MXU engine.

The synthesis pipeline's single most expensive remaining op (SURVEY §3.4,
`models.py:1157-1159`): warp an integer label map by a smooth bounded field.
"""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.utils import core, spatial


def timeit(f, *args, n1=2, n2=10):
    r = f(*args)
    _ = np.asarray(jnp.ravel(r)[:1])

    def run(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = f(*args)
        _ = np.asarray(jnp.ravel(o)[:1])
        return time.time() - t0
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), r


V = 128
rng = np.random.default_rng(0)
labels = jnp.asarray(rng.integers(0, 16, size=(1, V, V, V)), jnp.float32)
# smooth bounded field: blurred noise scaled to |d| <= 6 + a global shift
d = rng.normal(size=(V, V, V, 3)).astype(np.float32)
from scipy import ndimage
for c in range(3):
    d[..., c] = ndimage.gaussian_filter(d[..., c], 8)
d *= 6.0 / np.abs(d).max()
d += np.asarray([9.3, -7.1, 4.2], np.float32)
disp = jnp.asarray(d)[None]

variants = {
    'gather': lambda: spatial.batch_transform(
        labels, disp, interp_method='nearest', fill_value=0),
    'onehot-f32': lambda: spatial.batch_transform(
        labels, disp, interp_method='nearest', fill_value=0,
        impl='onehot', max_disp=8.0),
    'onehot-bf16': lambda: spatial.batch_transform(
        labels, disp, interp_method='nearest', fill_value=0,
        impl='onehot', max_disp=8.0, matmul_dtype=jnp.bfloat16),
    'onehot-bf16-x32': lambda: spatial.batch_transform(
        labels, disp, interp_method='nearest', fill_value=0,
        impl='onehot', max_disp=8.0, block=(8, 8, 32),
        matmul_dtype=jnp.bfloat16),
}

ref = None
for name, fn in variants.items():
    jf = jax.jit(fn)
    dt, r = timeit(jf)
    if ref is None:
        ref = np.asarray(r)
        err = 0
    else:
        err = (np.asarray(r) != ref).mean()
    print(f'{name:16s} {dt*1e3:7.2f} ms  {V**3/dt/1e9:6.3f} Gvox/s  '
          f'mismatch={err:.2e}', flush=True)
