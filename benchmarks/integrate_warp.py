"""Microbenchmark: SVF integration warp engines at synthesis shapes."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from neurite_tpu.utils import spatial

rng = np.random.default_rng(0)


def timeit(f, *args, n1=2, n2=8):
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


V = int(os.environ.get('SIZE', 64))
vel = jnp.asarray(rng.normal(size=(1, V, V, V, 3)), jnp.float32) * 2.0

f_auto = jax.jit(lambda v: spatial.batch_integrate_vec(v, nb_steps=5))
f_oh = jax.jit(lambda v: spatial.batch_integrate_vec(
    v, nb_steps=5, impl='onehot', max_disp=8.0))
dt_a, ra = timeit(f_auto, vel)
print(f'integrate auto   {dt_a*1000:8.2f} ms', flush=True)
dt_o, ro = timeit(f_oh, vel)
print(f'integrate onehot {dt_o*1000:8.2f} ms  maxdiff '
      f'{np.abs(np.asarray(ra)-np.asarray(ro)).max():.2e}', flush=True)

# compose-style warp: C=3 field warped by bounded shifts at full res
V2 = int(os.environ.get('SIZE2', 128))
field = jnp.asarray(rng.normal(size=(1, V2, V2, V2, 3)), jnp.float32)
shift = jnp.asarray(rng.uniform(-8, 8, size=(1, V2, V2, V2, 3)), jnp.float32)
g_auto = jax.jit(lambda f, s: spatial.batch_transform(f, s))
g_oh = jax.jit(lambda f, s: spatial.batch_transform(f, s, impl='onehot',
                                                    max_disp=8.0))
dt_a, ra = timeit(g_auto, field, shift)
print(f'compose-warp auto   {dt_a*1000:8.2f} ms', flush=True)
dt_o, ro = timeit(g_oh, field, shift)
print(f'compose-warp onehot {dt_o*1000:8.2f} ms  maxdiff '
      f'{np.abs(np.asarray(ra)-np.asarray(ro)).max():.2e}', flush=True)
