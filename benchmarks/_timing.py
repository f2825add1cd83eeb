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
        jax.block_until_ready(g(x0, *args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(x0, *args))
            ts.append(time.perf_counter() - t0)
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
        jax.block_until_ready(g(carry0, *args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(g(carry0, *args))
            ts.append(time.perf_counter() - t0)
        best[key] = min(ts)
    return 1e3 * (best['n'] - best['one']) / (n - 1)
