"""Robust device-side timing for the tunneled TPU runtime.

The axon tunnel adds a large, VARIABLE per-dispatch round trip (tens of ms),
so host-side loops that dispatch one execution per iteration measure mostly
tunnel jitter — two-point fits over such chains produced negative slopes in
the round-3/4 logs. Both helpers here put the WHOLE chain on device inside
one jit (one dispatch per measurement), repeat each measurement `reps`
times, and take the min, which is robust to one-sided noise (a dispatch can
only ever be delayed, never early).
"""
import time

import jax
import jax.numpy as jnp


def chain_ms(fn, x0, n=32, reps=4):
    """Per-call ms of `fn` (a shape-preserving v -> v) via a device-side
    fori_loop chain of length `n` inside ONE jit: min over `reps` runs of
    (chain time - baseline time) / (n - 1), where baseline is a length-1
    chain of the same program (cancels dispatch + jit-wrapper overhead).
    """
    def make(k):
        @jax.jit
        def g(v):
            return jax.lax.fori_loop(0, k, lambda i, vv: fn(vv), v)
        return g

    g1, gn = make(1), make(n)
    best = {}
    for key, g in (('one', g1), ('n', gn)):
        jax.block_until_ready(g(x0))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(x0))
            ts.append(time.perf_counter() - t0)
        best[key] = min(ts)
    return 1e3 * (best['n'] - best['one']) / (n - 1)


def step_chain_ms(step_fn, carry0, n=16, reps=3):
    """Per-step ms of a carried step (st -> st) via lax.scan inside one jit.

    step_fn(carry, i) -> carry; `i` is the step index (int32 scalar) for
    callers that need to vary keys/inputs so the runtime can't dedup.
    """
    def make(k):
        @jax.jit
        def g(c):
            def body(c, i):
                return step_fn(c, i), ()
            c, _ = jax.lax.scan(body, c, jnp.arange(k))
            return c
        return g

    g1, gn = make(1), make(n)
    best = {}
    for key, g in (('one', g1), ('n', gn)):
        jax.block_until_ready(g(carry0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(carry0))
            ts.append(time.perf_counter() - t0)
        best[key] = min(ts)
    return 1e3 * (best['n'] - best['one']) / (n - 1)
