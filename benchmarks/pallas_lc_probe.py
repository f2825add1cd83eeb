"""Isolate which construct in ops/pallas_lc.py breaks the remote Mosaic
compiler (HTTP 500 / tpu_compile_helper exit 1 on the v5e pool, while the
pallas_warp/blur/mi kernels compile fine).

Each probe is a minimal pallas_call exercising ONE suspect pattern at tiny
shapes; run on TPU, prints OK/FAIL per probe.
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK, C, T = 256, 4, 27
V = BLK * 4
K = T * C


failures = []


def probe(name, fn, expect):
    """expect: scalar every output element must equal (numpy oracle) —
    OK means compiled AND correct, not just compiled (ADVICE r2)."""
    try:
        r = np.asarray(jax.jit(fn)())
        np.testing.assert_allclose(r, np.full_like(r, expect), rtol=1e-6)
        print(f'{name:34s} OK', flush=True)
    except Exception as e:
        failures.append(name)
        print(f'{name:34s} FAIL: {type(e).__name__}: {str(e)[:140]}',
              flush=True)


# 1. single DMA from ANY->VMEM scratch, scalar sem
def p1():
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * BLK, BLK), :], scr, sem)
        dma.start(); dma.wait()
        o_ref[:, :] = scr[:, :] * 2.
    return pl.pallas_call(
        k, grid=(V // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.ones((V, 128), jnp.float32))


# 2. T DMAs into misaligned column slices of one scratch, sem array
def p2():
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dmas = []
        for t in range(T):
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK + t, BLK), :],
                scr.at[:, pl.ds(t * C, C)], sem.at[t])
            d.start(); dmas.append(d)
        for d in dmas:
            d.wait()
        o_ref[:, :] = jnp.sum(scr[:, :], axis=1, keepdims=True)
    return pl.pallas_call(
        k, grid=(V // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BLK, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((T,))],
    )(jnp.ones((V + T, C), jnp.float32))


# 3. T DMAs into tap-major 3D scratch planes (aligned targets), sem array
def p3():
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dmas = []
        for t in range(T):
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK + t, BLK), :],
                scr.at[t], sem.at[t])
            d.start(); dmas.append(d)
        for d in dmas:
            d.wait()
        acc = jnp.zeros((BLK, C), jnp.float32)
        for t in range(T):
            acc = acc + scr[t]
        o_ref[:, :] = acc
    return pl.pallas_call(
        k, grid=(V // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, BLK, C), jnp.float32),
                        pltpu.SemaphoreType.DMA((T,))],
    )(jnp.ones((V + T, C), jnp.float32))


# 4. wide VMEM block input (blk, K) K=108 misaligned lanes + reduce
def p4():
    def k(x_ref, o_ref):
        o_ref[:, :] = jnp.sum(x_ref[:, :], axis=1, keepdims=True)
    return pl.pallas_call(
        k, grid=(V // BLK,),
        in_specs=[pl.BlockSpec((BLK, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 1), jnp.float32),
    )(jnp.ones((V, K), jnp.float32))


# 5. bf16 DMA into bf16 scratch column slices (the real kernel's dtype)
def p5():
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        dmas = []
        for t in range(T):
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK + t, BLK), :],
                scr.at[:, pl.ds(t * C, C)], sem.at[t])
            d.start(); dmas.append(d)
        for d in dmas:
            d.wait()
        o_ref[:, :] = jnp.sum(scr[:, :].astype(jnp.float32), axis=1,
                              keepdims=True)
    return pl.pallas_call(
        k, grid=(V // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BLK, K), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((T,))],
    )(jnp.ones((V + T, C), jnp.bfloat16))


if __name__ == '__main__':
    print('backend:', jax.default_backend(), flush=True)
    probe('p1 single DMA scalar sem', p1, 2.)
    probe('p2 27 DMA col-slice f32', p2, float(K))
    probe('p3 27 DMA tap-plane 3D scratch', p3, float(T))
    probe('p4 K=108 VMEM block reduce', p4, float(K))
    probe('p5 27 DMA col-slice bf16', p5, float(K))
    if failures:
        print(f'FAILED probes: {failures}', flush=True)
        sys.exit(1)
