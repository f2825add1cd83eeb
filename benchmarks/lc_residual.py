"""Name the config-#3 ~19 ms full-vs-parts residual (VERDICT r4 #6).

Parts at 160^3 (benchmarks/lc_profile.py, device-side chains): trunk 28.0
+ LC fwd+bwd 21.3 + adam 12.3 ~= 62 ms; the full step measures 80.4. This
script traces the FULL step under jax.profiler and reports:
  - per-op totals (profile_top_ops) — what runs longer in-context,
  - per-device-line busy vs span (device_timeline_stats) — how much of the
    step is scheduling GAP (idle) rather than op time.

Usage: python benchmarks/lc_residual.py [top]
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from benchmarks.lc_profile import EncDecLC, size  # noqa: E402
from benchmarks.trace_ops import (device_timeline_stats,  # noqa: E402
                                  profile_top_ops)
from neurite_tpu import training  # noqa: E402


def main():
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    mse = lambda yt, yp: jnp.mean(  # noqa: E731
        (yt - yp.astype(jnp.float32)) ** 2)
    model = EncDecLC()
    st = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                     optax.adam(1e-4))
    stp = jax.jit(training.make_train_step(mse))
    st, m = stp(st, (x, y), jax.random.PRNGKey(1))
    _ = float(m['loss'])

    holder = {'st': st}

    def run(i):
        holder['st'], mm = stp(holder['st'], (x, y),
                               jax.random.fold_in(jax.random.PRNGKey(2), i))
        return mm['loss']

    import tempfile
    logdir = tempfile.mkdtemp(prefix='lc_residual_')
    steps = 4
    profile_top_ops(run, steps=steps, top=top, logdir=logdir)
    print('\n-- device timeline busy vs span (per line, / step) --',
          flush=True)
    for (plane, line), (busy, span, n) in sorted(
            device_timeline_stats(logdir).items()):
        if n < 2:
            continue
        print(f'{busy / steps:9.2f} / {span / steps:9.2f} ms busy/span '
              f'({n:5d} ev)  {plane[-28:]} :: {line[:40]}', flush=True)


if __name__ == '__main__':
    main()
