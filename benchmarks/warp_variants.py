"""
Unbounded-warp engine shootout (VERDICT r2 item 4): measure the one-hot
window engine's x-tiled and bf16x2 variants against the flat gather chain on
the bench's +-3 uniform displacement field at 128^3.

Usage: python benchmarks/warp_variants.py [variant ...]
Variants: gather oh88 oh88x2 oh8864 oh8864x2 oh8832x2 (default: all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
import neurite_tpu as ne  # noqa: E402
from neurite_tpu.ops import warp as warp_ops  # noqa: E402


def fit_chain(fn, x0, n1=1, n2=3):
    def chain(n):
        @jax.jit
        def g(v):
            for _ in range(n):
                v = fn(v)
            return v
        return g
    outs = []
    for g in (chain(n1), chain(n2)):
        r = g(x0)
        _ = np.asarray(r.ravel()[:1])
        t0 = time.time()
        r = g(x0)
        _ = np.asarray(r.ravel()[:1])
        outs.append(time.time() - t0)
    return (outs[1] - outs[0]) / (n2 - n1)


def main():
    wv = 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(wv, wv, wv, 1)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    shift = jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)), jnp.float32)
    loc = base + shift

    variants = {
        'gather': lambda v: ne.utils.interpn(v, loc),
        'oh88': lambda v: warp_ops.interpn_onehot(
            v, loc, max_disp=3.0, block=(8, 8)),
        'oh88x2': lambda v: warp_ops.interpn_onehot(
            v, loc, max_disp=3.0, block=(8, 8), matmul_dtype='bf16x2'),
        'oh8864': lambda v: warp_ops.interpn_onehot(
            v, loc, max_disp=3.0, block=(8, 8, 64)),
        'oh8864x2': lambda v: warp_ops.interpn_onehot(
            v, loc, max_disp=3.0, block=(8, 8, 64), matmul_dtype='bf16x2'),
        'oh8832x2': lambda v: warp_ops.interpn_onehot(
            v, loc, max_disp=3.0, block=(8, 8, 32), matmul_dtype='bf16x2'),
    }
    want = sys.argv[1:] or list(variants)

    ref = None
    for name in want:
        fn = variants[name]
        out = jax.jit(fn)(vol)
        out_np = np.asarray(out)
        if ref is None and name == 'gather':
            ref = out_np
        err = (np.abs(out_np - ref).max() if ref is not None else float('nan'))
        t = fit_chain(fn, vol)
        print(f'{name:10s} {1e3 * t:8.2f} ms  '
              f'{wv ** 3 / t / 1e9:6.3f} Gvox/s  maxerr={err:.2e}',
              flush=True)


if __name__ == '__main__':
    main()


def _window_variants():
    """Extra variants: the guarded unbounded-exact engine."""
    wv = 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(wv, wv, wv, 1)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    shift = jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)), jnp.float32)
    loc = base + shift
    for name, fn in [
        ('win8864', lambda v: warp_ops.interpn_window(
            v, loc, block=(8, 8, 64), window_pad=4)),
        ('win8864p5', lambda v: warp_ops.interpn_window(
            v, loc, block=(8, 8, 64), window_pad=5)),
        ('win1616128', lambda v: warp_ops.interpn_window(
            v, loc, block=(16, 16, 128), window_pad=4)),
    ]:
        out = jax.jit(fn)(vol)
        ref = np.asarray(ne.utils.interpn(vol, loc))
        err = np.abs(np.asarray(out) - ref).max()
        t = fit_chain(fn, vol)
        print(f'{name:10s} {1e3 * t:8.2f} ms  '
              f'{wv ** 3 / t / 1e9:6.3f} Gvox/s  maxerr={err:.2e}',
              flush=True)


def _pallas_variants():
    """The Pallas windowed kernel vs the XLA engines on the bench field."""
    from neurite_tpu.ops import pallas_warp
    wv = 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(wv, wv, wv)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    shift = jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)), jnp.float32)
    loc = base + shift
    ref = np.asarray(ne.utils.interpn(vol, loc))
    for name, fn in [
        ('pallas88', lambda v: pallas_warp.interpn_pallas(
            v, loc, max_disp=3.0, block=(8, 8))),
        ('pallas48', lambda v: pallas_warp.interpn_pallas(
            v, loc, max_disp=3.0, block=(4, 8))),
        ('pallas1616', lambda v: pallas_warp.interpn_pallas(
            v, loc, max_disp=3.0, block=(16, 16))),
    ]:
        try:
            out = jax.jit(fn)(vol)
            err = np.abs(np.asarray(out) - ref).max()
            t = fit_chain(fn, vol)
            print(f'{name:10s} {1e3 * t:8.2f} ms  '
                  f'{wv ** 3 / t / 1e9:6.3f} Gvox/s  maxerr={err:.2e}',
                  flush=True)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)
