"""VERDICT r4 item 7: the transposed LC scheme at filters>1.

Compares the three locally-connected formulations standalone (fwd and
fwd+grad, fori-chain two-point fit) at a filters=4 head shape on 160^3:

  einsum     : patches [V, k^3*C] + batched matmul `bvi,vio->bvo`
               (keras layout — what 'bigger heads' route to)
  per_tap    : keras-layout per-tap VPU multiply-reduce (_lc_per_tap)
  transposed : [O, k^3*C, V] storage, one broadcast multiply-reduce per
               tap (ops/lc_tap.py, r4-vectorized)

LC_SIZE=96 shrinks the volume (the einsum form OOMs at 160^3 f32 patches).
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neurite_tpu.layers import local as L  # noqa: E402
from neurite_tpu.ops import lc_tap  # noqa: E402
from benchmarks._timing import step_chain_ms  # noqa: E402

size = int(os.environ.get('LC_SIZE', 160))
C, O, k = 4, 4, 3
ks = (k, k, k)
V = size ** 3
TC = k ** 3 * C

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, size, size, size, C)), jnp.bfloat16)
kt = jnp.asarray(rng.normal(size=(O, TC, V)) * 0.01, jnp.bfloat16)
kk = lc_tap.transposed_to_keras(kt)                       # [V, TC, O]


def f_einsum(x, kk):
    patches, out_shape = L._extract_patches(x, ks, (1, 1, 1), 'same')
    p = patches.reshape(patches.shape[0], int(np.prod(out_shape)), TC)
    y = jnp.einsum('bvi,vio->bvo', p, kk,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def f_pertap(x, kk):
    y, _ = L._lc_per_tap(x, kk, ks, (1, 1, 1), 'same', O)
    return y.astype(x.dtype)


def f_transposed(x, kt):
    return lc_tap.lc_transposed(x, kt, ks, 'same').astype(x.dtype)


def f_pallas(x, kt):
    from neurite_tpu.ops import pallas_lc2
    return pallas_lc2.lc_transposed_pallas(x, kt, ks).astype(x.dtype)


def fit(fn, x0, w0, n=8):
    def step(t, i, x0, w0):
        r = fn(x0 + t.astype(x0.dtype), w0)
        return 0. * jax.lax.optimization_barrier(
            jnp.float32(jnp.asarray(r).ravel()[0]))
    return step_chain_ms(step, jnp.zeros(()), n=n, args=(x0, w0))


def gfit(fn, x0, w0, n=8):
    def g(x0, k0):
        return jnp.sum(jnp.asarray(fn(x0, k0), jnp.float32) ** 2)
    gr = jax.grad(g, argnums=(0, 1))

    def step(t, i, x0, w0):
        gx, gw = gr(x0 + t.astype(x0.dtype), w0)
        return (0. * jax.lax.optimization_barrier(
                    jnp.float32(gx.ravel()[0]))
                + 0. * jax.lax.optimization_barrier(
                    jnp.float32(gw.ravel()[0])))
    return step_chain_ms(step, jnp.zeros(()), n=n, args=(x0, w0))


forms = [('transposed', f_transposed, kt),
         ('pallas', f_pallas, kt),
         ('per_tap', f_pertap, kk),
         ('einsum', f_einsum, kk)]
sel = sys.argv[1:] or [n for n, _, _ in forms]

# numeric parity first (tiny shape)
xs = jnp.asarray(rng.normal(size=(1, 4, 6, 6, C)), jnp.float32)
kts = jnp.asarray(rng.normal(size=(O, TC, 4 * 6 * 6)), jnp.float32)
kks = lc_tap.transposed_to_keras(kts)
a = f_transposed(xs, kts)
b = f_pertap(xs, kks).reshape(a.shape)
c = f_einsum(xs, kks).reshape(a.shape)
np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)
np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-3)
print(f'parity ok; timing at {size}^3 C={C} O={O} '
      f'({O * TC * V / 1e9:.2f}G params)', flush=True)

for name, fn, w in forms:
    if name not in sel:
        continue
    try:
        ms_f = fit(fn, x, w)
        ms_g = gfit(fn, x, w)
        print(f'{name:11s}: fwd {ms_f:8.1f} ms   fwd+grad {ms_g:8.1f} ms',
              flush=True)
    except Exception as e:
        print(f'{name:11s}: FAIL {type(e).__name__}: {str(e)[:120]}',
              flush=True)
