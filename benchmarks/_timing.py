"""Robust device-side timing for the tunneled TPU runtime.

The axon tunnel adds a large, VARIABLE per-dispatch round trip (tens of ms),
so host-side loops that dispatch one execution per iteration measure mostly
tunnel jitter — two-point fits over such chains produced negative slopes in
the round-3/4 logs. Both helpers here put the WHOLE chain on device inside
one jit (one dispatch per measurement), repeat each measurement `reps`
times, and take the min, which is robust to one-sided noise (a dispatch can
only ever be delayed, never early).

Each repetition perturbs the carry by a fresh host value (i * tiny) so no
two dispatches carry identical (program, input) pairs — the tunneled
runtime can serve repeat executions from cache, which reads as ~0 ms.
TIMING_DEBUG=1 prints the raw chain wall times.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_DEBUG = os.environ.get('TIMING_DEBUG', '') not in ('', '0')


def _sync(x):
    """Force completion by FETCHING one element of the first array leaf.

    `jax.block_until_ready` is NOT a reliable barrier on every tunneled
    PJRT runtime this repo meets: on the 2026-08-19 pool instance it
    returns in ~0.1 ms while the chain is still in flight (measured: a
    16-step scan of a 96 ms train step "completed" in 0.1 ms; a real fetch
    takes the expected seconds). Only a device_get round trip is
    guaranteed to wait, so both helpers sync through a one-element fetch —
    the extra dispatch RTT is constant and cancels in the two-point fit.
    """
    leaf = next((v for v in jax.tree.leaves(x)
                 if hasattr(v, 'dtype') and getattr(v, 'size', 0)), None)
    if leaf is not None:
        np.asarray(jax.device_get(leaf.ravel()[0]))


def _perturb(x, r):
    """Tweak the carry by a rep-dependent ULP-scale epsilon (first float
    leaf only) so the input BUFFER bytes differ between reps — a fixed tiny
    constant would round away against O(1) values and leave the buffer
    byte-identical (deduplicable)."""
    leaves, treedef = jax.tree.flatten(x)
    done = False
    out = []
    for v in leaves:
        if (not done and hasattr(v, 'dtype')
                and jnp.issubdtype(v.dtype, jnp.floating)):
            eps = float(jnp.finfo(v.dtype).eps)
            out.append(v * (1. + jnp.asarray(2. * r * eps, v.dtype)))
            done = True
        else:
            out.append(v)
    return jax.tree.unflatten(treedef, out)


def chain_ms(fn, x0, n=32, reps=4, args=()):
    """Per-call ms of `fn` (a shape-preserving v -> v) via a device-side
    fori_loop chain of length `n` inside ONE jit: min over `reps` runs of
    (chain time - baseline time) / (n - 1), where baseline is a length-1
    chain of the same program (cancels dispatch + jit-wrapper overhead).

    Extra `args` are threaded through as jit ARGUMENTS of the chain
    (`fn(v, *args)`): pass big tensors (params, volumes) here rather than
    closing over them — closed-over arrays embed as HLO constants and the
    tunneled compile server rejects oversized request bodies (HTTP 413).
    """
    def make(k):
        @jax.jit
        def g(v, *a):
            return jax.lax.fori_loop(0, k, lambda i, vv: fn(vv, *a), v)
        return g

    g1, gn = make(1), make(n)
    best = {}
    for key, g in (('one', g1), ('n', gn)):
        _sync(g(x0, *args))  # compile + warm
        ts = []
        for r in range(reps):
            xr = _perturb(x0, r + 1)
            t0 = time.perf_counter()
            _sync(g(xr, *args))
            ts.append(time.perf_counter() - t0)
        if _DEBUG:
            print(f'  [chain_ms {key}] raw s: '
                  + ' '.join(f'{t:.4f}' for t in ts), flush=True)
        best[key] = min(ts)
    return 1e3 * (best['n'] - best['one']) / (n - 1)


def step_chain_ms(step_fn, carry0, n=16, reps=3, args=()):
    """Per-step ms of a carried step (st -> st) via lax.scan inside one jit.

    step_fn(carry, i, *args) -> carry; `i` is the step index (int32 scalar)
    for callers that need to vary keys/inputs so the runtime can't dedup.
    Pass big tensors via `args` (jit arguments), NOT closures — see
    `chain_ms`.
    """
    def make(k):
        @jax.jit
        def g(c, *a):
            def body(c, i):
                return step_fn(c, i, *a), ()
            c, _ = jax.lax.scan(body, c, jnp.arange(k))
            return c
        return g

    g1, gn = make(1), make(n)
    best = {}
    for key, g in (('one', g1), ('n', gn)):
        _sync(g(carry0, *args))  # compile + warm
        ts = []
        for r in range(reps):
            cr = _perturb(carry0, r + 1)
            t0 = time.perf_counter()
            _sync(g(cr, *args))
            ts.append(time.perf_counter() - t0)
        if _DEBUG:
            print(f'  [step_chain_ms {key}] raw s: '
                  + ' '.join(f'{t:.4f}' for t in ts), flush=True)
        best[key] = min(ts)
    return 1e3 * (best['n'] - best['one']) / (n - 1)
