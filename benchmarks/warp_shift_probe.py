"""
Probe for the v2 windowed-warp kernel (VERDICT r3 item 1): check the Pallas
primitives the select-over-shifts design needs, then measure a first kernel.

Probes:
  1. pltpu.roll semantics on [8, 128] (static shift)
  2. roll with traced (dynamic) shift
  3. broadcast of a [W] slab row against [by, W]
  4. jnp.take_along_axis along lanes (informational)
Each probe asserts against numpy, so OK means correct (ADVICE r2).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

failures = []


def probe(name, fn):
    try:
        fn()
        print(f'{name}: OK', flush=True)
    except Exception as e:
        failures.append(name)
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:300]}', flush=True)


def p_roll_static():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    # document which convention holds: out[w] == x[w-3] (right shift)?
    got = np.asarray(out)
    right = np.roll(np.asarray(x), 3, axis=1)
    left = np.roll(np.asarray(x), -3, axis=1)
    if np.array_equal(got, right):
        print('  roll(+3) == np.roll(+3) (right shift: out[w]=x[w-3])')
    elif np.array_equal(got, left):
        print('  roll(+3) == np.roll(-3) (left shift: out[w]=x[w+3])')
    else:
        raise AssertionError('roll matches neither convention')


def p_roll_dynamic():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    s = jnp.asarray([5], jnp.int32)
    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(s, x)
    got = np.asarray(out)
    ok = (np.array_equal(got, np.roll(np.asarray(x), 5, 1))
          or np.array_equal(got, np.roll(np.asarray(x), -5, 1)))
    assert ok, 'dynamic roll wrong values'


def p_row_broadcast():
    def k(x_ref, o_ref):
        row = x_ref[2, 5, :].reshape(1, 128)
        o_ref[:] = row * jnp.ones((8, 128), jnp.float32)

    x = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.broadcast_to(np.asarray(x)[2, 5], (8, 128)))


def p_take_along_lanes():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (8, 128)),
                      jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x, idx)
    np.testing.assert_array_equal(
        np.asarray(out),
        np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1))


if __name__ == '__main__':
    print(f'backend: {jax.default_backend()}', flush=True)
    probe('roll_static', p_roll_static)
    probe('roll_dynamic', p_roll_dynamic)
    probe('row_broadcast', p_row_broadcast)
    probe('take_along_lanes', p_take_along_lanes)
    if failures:
        print(f'FAILED: {failures}')
        sys.exit(1)
