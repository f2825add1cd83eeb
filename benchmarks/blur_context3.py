"""
Custom-call blast radius (VERDICT r2 item 5, part 3): the synth programs
regress +170ms when ANY Mosaic custom call is present (blur_context2.py:
identity kernel 213ms vs 40ms off). Which program structures are affected?

  unet / unet_ident  : 3-D UNet-128^3 train step, with/without a pallas
                       identity on the input batch.
  warp / warp_ident  : chained one-hot window warps (scan-heavy, like the
                       synth engines), with/without the identity kernel.
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, '.')
import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402
from neurite_tpu.ops import warp as warp_ops  # noqa: E402
from benchmarks.blur_context2 import pallas_identity  # noqa: E402


def two_point(run, a, b):
    outs = []
    for n in (a, b):
        t0 = time.time()
        run(n)
        outs.append(time.time() - t0)
    return (outs[1] - outs[0]) / (b - a)


def unet_case(with_ident):
    vol, batch = 128, 4
    model = ne.models.unet(nb_features=16, input_shape=(vol,) * 3 + (1,),
                           nb_levels=4, conv_size=3, nb_labels=4, feat_mult=2,
                           nb_conv_per_level=2, dtype=jnp.bfloat16,
                           conv_impl='auto')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, vol, vol, vol, 1)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(
        rng.integers(0, 4, size=(batch, vol, vol, vol))), 4)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))
    loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
    base = training.make_train_step(loss_fn)

    def step(st, batch_, key):
        xx, yy = batch_
        if with_ident:
            xx = pallas_identity(xx[..., 0])[..., None]
        return base(st, (xx, yy), key)

    c = jax.jit(step, donate_argnums=(0,))
    st, m = c(state, (x, y), jax.random.PRNGKey(1))
    _ = float(m['loss'])

    def run(n):
        nonlocal st
        for i in range(n):
            st, m = c(st, (x, y), jax.random.PRNGKey(i))
        _ = float(m['loss'])

    return two_point(run, 3, 13)


def warp_case(with_ident):
    wv = 128
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(wv, wv, wv, 1)), jnp.float32)
    base = jnp.stack(ne.utils.volshape_to_ndgrid((wv,) * 3),
                     -1).astype(jnp.float32)
    loc = base + jnp.asarray(rng.uniform(-3, 3, size=(wv, wv, wv, 3)),
                             jnp.float32)

    @jax.jit
    def f(v):
        for _ in range(3):
            v = warp_ops.interpn_onehot(v, loc, max_disp=3.0, block=(8, 8))
        if with_ident:
            v = pallas_identity(v[None, ..., 0])[0, ..., None]
        return v

    r = f(vol)
    _ = np.asarray(r.ravel()[:1])

    def run(n):
        r = vol
        for _ in range(n):
            r = f(r)
        _ = np.asarray(r.ravel()[:1])

    return two_point(run, 1, 3)


def main():
    for name in (sys.argv[1:] or ['warp', 'warp_ident', 'unet',
                                  'unet_ident']):
        t0 = time.time()
        if name == 'unet':
            t = unet_case(False)
        elif name == 'unet_ident':
            t = unet_case(True)
        elif name == 'warp':
            t = warp_case(False)
        else:
            t = warp_case(True)
        print(f'{name:11s}: {1e3 * t:7.1f} ms '
              f'(total incl. compile {time.time() - t0:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
