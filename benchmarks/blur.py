"""Microbenchmark: fused Pallas blur vs per-axis XLA passes."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from neurite_tpu.ops import blur
from neurite_tpu.utils import core


def timeit(f, *args, n1=2, n2=12):
    r = f(*args)
    _ = np.asarray(r.ravel()[:1])

    def run(n):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = f(*args)
        _ = np.asarray(o.ravel()[:1])
        return time.time() - t0
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), r


rng = np.random.default_rng(0)
for V, w in ((128, 7), (128, 13), (64, 7), (64, 15)):
    x = jnp.asarray(rng.normal(size=(1, V, V, V)), jnp.float32)
    ks = [jnp.asarray(rng.uniform(0.1, 1, w), jnp.float32)] * 3
    f_j = jax.jit(lambda x, ks=ks: blur._blur3d_jnp(x, *ks))
    f_p = jax.jit(lambda x, ks=ks: blur.separable_blur3d(x, ks,
                                                         impl='pallas'))
    dt_j, rj = timeit(f_j, x)
    dt_p, rp = timeit(f_p, x)
    err = np.abs(np.asarray(rj) - np.asarray(rp)).max()
    print(f'{V}^3 k={w}: xla {dt_j*1e3:7.2f} ms  pallas {dt_p*1e3:7.2f} ms '
          f'({dt_j/dt_p:.1f}x)  maxerr={err:.1e}', flush=True)
