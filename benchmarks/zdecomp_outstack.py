"""Experiment: output-stacked z-decomposition vs the current per-tap form.

Current `ops.zdecomp.conv_z2d`: kd conv2ds over z-shifted input slabs
(input read kd times via dynamic_slice copies). Candidate: ONE conv2d with
the kd z-taps concatenated on the output-channel axis (input read once,
kd-x wider MXU matmul), then a shifted-add epilogue over the z axis.
Under 128-lane padding the stacked output (kd*F<=128 for F=16,kd=3) costs
no extra write traffic.
"""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.ops.zdecomp import conv_z2d


def conv_z2d_outstack(x, kernel, bias=None):
    """Same math as conv_z2d; one wide conv2d + shifted-add epilogue."""
    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel)
    b, d, h, w, c = x.shape
    kd, kh, kw, _, f = kernel.shape
    if kernel.dtype != x.dtype:
        kernel = kernel.astype(x.dtype)
    pad_lo = (kd - 1) // 2
    pad_hi = kd - 1 - pad_lo
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
    dp = d + kd - 1
    # [kh, kw, c, kd*f]: tap a occupies out-channel block a
    k2 = jnp.moveaxis(kernel, 0, -2).reshape(kh, kw, c, kd * f)
    dn2 = jax.lax.conv_dimension_numbers(
        (b * dp, h, w, c), k2.shape, ('NHWC', 'HWIO', 'NHWC'))
    yfull = jax.lax.conv_general_dilated(
        xp.reshape(b * dp, h, w, c), k2, (1, 1), 'SAME',
        dimension_numbers=dn2)
    yfull = yfull.reshape(b, dp, h, w, kd, f)
    y = None
    for a in range(kd):
        part = jax.lax.dynamic_slice_in_dim(yfull, a, d, axis=1)[..., a, :]
        y = part if y is None else y + part
    if bias is not None:
        y = y + jnp.asarray(bias, y.dtype)
    return y


def timeit(f, *args, n1=3, n2=13):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else \
        jax.block_until_ready(f(*args))
    def run(n):
        t0 = time.time()
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)
        return time.time() - t0
    return (run(n2) - run(n1)) / (n2 - n1)


if __name__ == '__main__':
    rng = np.random.default_rng(0)
    d = 128
    c = f = 16
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(1, d, d, d, c)), dt)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, c, f)) * 0.1, dt)

    ref = np.asarray(conv_z2d(x, k), np.float32)
    new = np.asarray(conv_z2d_outstack(x, k), np.float32)
    err = np.abs(ref - new).max() / (np.abs(ref).max() + 1e-8)
    print(f'parity rel err: {err:.2e}', flush=True)

    f_cur = jax.jit(conv_z2d)
    f_new = jax.jit(conv_z2d_outstack)
    print(f'fwd   current  {timeit(f_cur, x, k)*1e3:7.2f} ms', flush=True)
    print(f'fwd   outstack {timeit(f_new, x, k)*1e3:7.2f} ms', flush=True)

    def loss_cur(x, k):
        return jnp.sum(conv_z2d(x, k).astype(jnp.float32) ** 2)

    def loss_new(x, k):
        return jnp.sum(conv_z2d_outstack(x, k).astype(jnp.float32) ** 2)

    g_cur = jax.jit(jax.grad(loss_cur, argnums=(0, 1)))
    g_new = jax.jit(jax.grad(loss_new, argnums=(0, 1)))
    gc = g_cur(x, k)
    gn = g_new(x, k)
    gerr = max(float(jnp.abs(a.astype(jnp.float32) -
                             b.astype(jnp.float32)).max())
               for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gn)))
    print(f'grad abs err: {gerr:.2e}', flush=True)
    print(f'bwd   current  {timeit(g_cur, x, k)*1e3:7.2f} ms', flush=True)
    print(f'bwd   outstack {timeit(g_new, x, k)*1e3:7.2f} ms', flush=True)
