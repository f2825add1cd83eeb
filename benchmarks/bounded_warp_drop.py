"""VERDICT r3 item 5: why did `interpn_bounded_warp_gvoxps` read 0.21 (r1)
but 0.179 (r2)?

Facts: the one-hot engine's math did not change between the rounds (the
only diff is an `unroll` knob defaulting to the old behavior); what changed
is bench.py's measurement — r1 differenced chain lengths (1, 2), r2 uses
(1, 9). This script times the SAME current engine under both recipes,
repeated, to attribute the delta to methodology + tunnel scatter vs a real
regression.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import neurite_tpu as ne

wv = 128
rng = np.random.default_rng(0)
wvol = jnp.asarray(rng.normal(size=(wv, wv, wv, 1)), jnp.float32)
base_grid = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                      -1).astype(jnp.float32)
loc = base_grid + jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)),
                              jnp.float32)

fn = lambda v: ne.utils.interpn(v, loc, impl='onehot', max_disp=3.0)  # noqa


def chain(k):
    def f(v):
        def body(i, u):
            return fn(u).reshape(v.shape)
        return jax.lax.fori_loop(0, k, body, v)
    return jax.jit(f)


def timeit(jf, v):
    r = jf(v)
    _ = np.asarray(r.ravel()[:1])
    t0 = time.time()
    r = jf(v)
    _ = np.asarray(r.ravel()[:1])
    return time.time() - t0


for n1, n2 in ((1, 2), (1, 9)):
    c1, c2 = chain(n1), chain(n2)
    timeit(c1, wvol), timeit(c2, wvol)  # compile+warm both
    for rep in range(4):
        t1, t2 = timeit(c1, wvol), timeit(c2, wvol)
        step = (t2 - t1) / (n2 - n1)
        print(f'chains ({n1},{n2}) rep {rep}: step {1e3 * step:6.2f} ms '
              f'= {wv ** 3 / step / 1e9:.3f} Gvox/s', flush=True)

# the definitive number: whole chain on device in one dispatch, min of reps
from benchmarks._timing import chain_ms  # noqa: E402
ms = chain_ms(lambda v: fn(v).reshape(wvol.shape), wvol, n=16)
print(f'device-side chain_ms: {ms:6.2f} ms = '
      f'{wv ** 3 / (ms / 1e3) / 1e9:.3f} Gvox/s', flush=True)
