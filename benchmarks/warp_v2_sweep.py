"""Warp v2 kernel sweep (VERDICT r4 item 3): block shapes, guard modes,
methods, and the new W>128 panel-gather path, k-chain timed at 128^3
(and 160^3 for the wide-lane case).

Variants (each timed with benchmarks._timing.chain_ms — device-side fori
chain, min over repetitions; the earlier host-loop two-point fits measured
tunnel dispatch jitter and produced negative slopes):
  kernel      : interpn_pallas direct (no guard, no cond)
  production  : interpn(impl='window') — runtime guard + cond (the driver
                metric's path)
  guard_none  : interpn(impl='window', guard='none')
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu.ops import pallas_warp  # noqa: E402
from benchmarks._timing import chain_ms  # noqa: E402


def bench(wv, method, variant, block, n2=64):
    rng = np.random.default_rng(0)
    wvol = jnp.asarray(rng.normal(size=(wv, wv, wv)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-3, 3, size=(wv,) * 3 + (3,)),
                             jnp.float32)
    if variant == 'kernel':
        fn = lambda v: pallas_warp.interpn_pallas(   # noqa: E731
            v, loc, interp_method=method, max_disp=3.0, block=block)
    else:
        guard = 'none' if variant == 'guard_none' else 'runtime'
        fn = lambda v: ne.utils.interpn(             # noqa: E731
            v[..., None], loc, impl='window', interp_method=method,
            max_disp=3.0, block=block, guard=guard)[..., 0]
    # parity spot-check once
    want = np.asarray(ne.utils.interpn(wvol, loc, interp_method=method))
    got = np.asarray(fn(wvol))
    err = float(np.max(np.abs(got - want)))
    dt = chain_ms(fn, wvol, n=n2) / 1e3
    gv = wv ** 3 / dt / 1e9
    print(f'W={wv} {method:7s} {variant:10s} block={block}: '
          f'{1e3 * dt:6.3f} ms = {gv:5.2f} Gvox/s  (err {err:.1e})',
          flush=True)


if __name__ == '__main__':
    which = sys.argv[1:] or ['main']
    if 'main' in which or 'blocks' in which:
        for block in ((2, 8), (4, 8), (8, 8), (16, 8), (4, 16), (8, 16)):
            bench(128, 'linear', 'kernel', block)
    if 'main' in which or 'variants' in which:
        blk = tuple(int(x) for x in os.environ.get('SWEEP_BLOCK',
                                                   '4,8').split(','))
        for variant in ('kernel', 'production', 'guard_none'):
            bench(128, 'linear', variant, blk)
            bench(128, 'nearest', variant, blk)
    if 'main' in which or 'wide' in which:
        for block in ((2, 8), (4, 8)):
            bench(160, 'linear', 'kernel', block, n2=32)
            bench(160, 'nearest', 'kernel', block, n2=32)
