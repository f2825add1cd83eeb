"""Probe round 2: is the Mosaic remote-compile failure the semaphore ARRAY,
or the number of concurrent DMAs? (probe 1 showed: 1 DMA + scalar sem OK;
27 DMAs + sem array FAIL in every variant.)"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK, C = 256, 4
V = BLK * 4


failures = []


def probe(name, fn, expect):
    """expect: scalar every output element must equal — OK means compiled
    AND correct (ADVICE r2)."""
    try:
        r = np.asarray(jax.jit(fn)())
        np.testing.assert_allclose(r, np.full_like(r, expect), rtol=1e-6)
        print(f'{name:40s} OK', flush=True)
    except Exception as e:
        failures.append(name)
        print(f'{name:40s} FAIL: {type(e).__name__}: {str(e)[:100]}',
              flush=True)


def serial_scalar_sem(T):
    # T DMAs, one scalar sem, strictly serial start/wait
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        for t in range(T):
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK + t, BLK), :], scr.at[t], sem)
            d.start(); d.wait()
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
                        pltpu.SemaphoreType.DMA],
    )(jnp.ones((V + T, C), jnp.float32))


def overlap_sem_array(T):
    # T DMAs, sem array, all started then all waited
    def k(x_hbm, o_ref, scr, sem):
        i = pl.program_id(0)
        ds = []
        for t in range(T):
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK + t, BLK), :], scr.at[t], sem.at[t])
            d.start(); ds.append(d)
        for d in ds:
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


if __name__ == '__main__':
    print('backend:', jax.default_backend(), flush=True)
    probe('serial scalar-sem T=2', lambda: serial_scalar_sem(2), 2.)
    probe('overlap sem-array T=2', lambda: overlap_sem_array(2), 2.)
    probe('serial scalar-sem T=27', lambda: serial_scalar_sem(27), 27.)
    probe('overlap sem-array T=4', lambda: overlap_sem_array(4), 4.)
    if failures:
        print(f'FAILED probes: {failures}', flush=True)
        sys.exit(1)
