"""Minimal repro of the 160^3 pure-XLA LC-head remote-compile crash
(VERDICT r4 #5; docs/DESIGN.md config #3 "KNOWN ISSUE").

With NEURITE_PALLAS_LC=0 the FULL config-#3 train step at 160^3 gets
HTTP 500 / `tpu_compile_helper subprocess exit code 1` from this pool's
remote compiler. This script bisects which sub-program triggers it:

  a. LC fwd alone (XLA transposed tap sum)        — expected: compiles
  b. LC fwd+bwd alone                             — expected: compiles
  c. trunk train step alone (no LC)               — expected: compiles
  d. FULL trunk+LC train step                     — expected: CRASH

Each stage prints OK/CRASH with the compile wall time; run on the TPU
pool. The production workarounds are (1) the default-on Pallas LC v2
path single-chip and (2) `parallel.sharded_lc` multi-device (per-shard
programs are smaller and each shard may also take the Pallas kernel —
`impl='pallas'`).

Usage: NEURITE_PALLAS_LC=0 python benchmarks/lc_xla_crash_repro.py [a b c d]
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
os.environ.setdefault('NEURITE_PALLAS_LC', '0')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from benchmarks.lc_profile import EncDecLC, size, pdt  # noqa: E402
from neurite_tpu import training  # noqa: E402


def attempt(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f'{name}: OK ({time.time() - t0:.0f}s)', flush=True)
    except Exception as exc:  # noqa: BLE001 - report the crash and continue
        print(f'{name}: CRASH {type(exc).__name__}: {str(exc)[:160]} '
              f'({time.time() - t0:.0f}s)', flush=True)


def main():
    which = sys.argv[1:] or ['a', 'b', 'c', 'd']
    rng = np.random.default_rng(0)
    xl = jnp.asarray(rng.normal(size=(1, size, size, size, 4)), jnp.bfloat16)
    lc = ne.layers.LocallyConnected3D(filters=1, kernel_size=3,
                                      padding='same', param_dtype=pdt)
    v = lc.init(jax.random.PRNGKey(0), xl)

    if 'a' in which:
        attempt('a_lc_fwd', lambda: jax.jit(
            lambda v, xx: lc.apply(v, xx))(v, xl).block_until_ready())
    if 'b' in which:
        def b():
            g = jax.jit(jax.grad(
                lambda v, xx: jnp.mean(
                    lc.apply(v, xx).astype(jnp.float32) ** 2),
                argnums=(0, 1)))(v, xl)
            jax.block_until_ready(g)
        attempt('b_lc_grad', b)

    x = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    mse = lambda yt, yp: jnp.mean(  # noqa: E731
        (yt - yp.astype(jnp.float32)) ** 2)
    if 'c' in which:
        def c():
            trunk = EncDecLC(with_lc=False)
            st = training.create_train_state(trunk, jax.random.PRNGKey(0), x,
                                             optax.adam(1e-4))
            st2, m = jax.jit(training.make_train_step(mse))(
                st, (x, y), jax.random.PRNGKey(1))
            _ = float(m['loss'])
        attempt('c_trunk_step', c)
    if 'd' in which:
        def d():
            model = EncDecLC()
            st = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                             optax.adam(1e-4))
            st2, m = jax.jit(training.make_train_step(mse))(
                st, (x, y), jax.random.PRNGKey(1))
            _ = float(m['loss'])
        attempt('d_full_step', d)


if __name__ == '__main__':
    main()
