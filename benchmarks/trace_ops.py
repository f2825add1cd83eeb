"""Reusable device-profile helper: run a step under `jax.profiler.trace`
and print the top XLA ops by total device time.

Usage as a library:
    from benchmarks.trace_ops import profile_top_ops
    profile_top_ops(lambda i: step(...), steps=5, top=25)

Parses the xplane protobuf directly (tensorboard_plugin_profile), so no
TensorBoard round trip is needed. TPU device planes are the ones named
'/device:TPU:*'; per-op totals aggregate events across lines (cores) and
steps, keyed by the event metadata display name (the HLO op name with its
source fusion annotation stripped to the leading category).
"""
import collections
import glob
import os
import tempfile

import jax


def _load_xspaces(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    out = []
    for p in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, 'rb') as f:
            xs.ParseFromString(f.read())
        out.append(xs)
    return out


def device_op_totals(logdir, plane_match=('/device:',)):
    """{op_name: total_duration_ms} summed over device-plane events."""
    totals = collections.Counter()
    for xs in _load_xspaces(logdir):
        for plane in xs.planes:
            if not any(m in plane.name for m in plane_match):
                continue
            meta = {m_id: m.display_name or m.name
                    for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e9
    return totals


def device_timeline_stats(logdir, plane_match=('/device:',)):
    """Per device-plane line: busy time (sum of event durations, overlap-
    merged) vs span (last end - first start) — the direct measurement of
    SCHEDULING GAPS a per-op total cannot see. Returns
    {(plane, line): (busy_ms, span_ms, n_events)}."""
    out = {}
    for xs in _load_xspaces(logdir):
        for plane in xs.planes:
            if not any(m in plane.name for m in plane_match):
                continue
            for line in plane.lines:
                iv = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                            for ev in line.events)
                if not iv:
                    continue
                busy = 0
                cs, ce = iv[0]
                for s, e in iv[1:]:
                    if s > ce:
                        busy += ce - cs
                        cs, ce = s, e
                    else:
                        ce = max(ce, e)
                busy += ce - cs
                span = max(m[1] for m in iv) - iv[0][0]
                out[(plane.name, line.name or str(line.id))] = (
                    busy / 1e9, span / 1e9, len(line.events))
    return out


def profile_top_ops(run_step, steps=5, top=30, logdir=None, quiet=False):
    """Run `run_step(i)` for i in range(steps) under a trace; return and
    (optionally) print the top ops by total device ms (divided by steps)."""
    logdir = logdir or tempfile.mkdtemp(prefix='trace_ops_')
    with jax.profiler.trace(logdir):
        for i in range(steps):
            r = run_step(i)
        jax.block_until_ready(r)
    totals = device_op_totals(logdir)
    items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    if not quiet:
        tot = sum(totals.values())
        print(f'total device time {tot / steps:8.2f} ms/step '
              f'({len(totals)} distinct ops, {steps} steps)', flush=True)
        for name, ms in items:
            print(f'{ms / steps:8.3f} ms  {name[:110]}', flush=True)
    return {k: v / steps for k, v in totals.items()}


if __name__ == '__main__':
    # smoke: profile a tiny matmul chain (on CPU backends there is no
    # '/device:' plane — expect an empty table; real use is on TPU)
    import jax.numpy as jnp
    x = jnp.ones((512, 512))

    @jax.jit
    def f(x):
        for _ in range(4):
            x = x @ x
        return x

    jax.block_until_ready(f(x))
    profile_top_ops(lambda i: f(x + i), steps=3, top=10)
