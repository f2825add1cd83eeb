"""
Blur in-context localization, part 2 (VERDICT r2 item 5).

Programs measured (full 128^3 synthesis forward unless noted):
  off      : XLA blur everywhere (baseline)
  on       : fused Pallas blur (known +170ms regression)
  identity : a trivial Pallas identity kernel in the blur's dataflow spot,
             XLA blur for the actual math — does the MERE PRESENCE of a
             custom call cause the regression?
  tap      : Pallas blur, but the program output is the blur result itself
             (downstream DCE'd) — is the interaction upstream or downstream?
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
import neurite_tpu as ne  # noqa: E402
from neurite_tpu.ops import blur as blur_ops  # noqa: E402


def pallas_identity(x):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        kern,
        grid=(x.shape[1] // 8,),
        in_specs=[pl.BlockSpec((1, 8, x.shape[2], x.shape[3]),
                               lambda i: (0, i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, x.shape[2], x.shape[3]),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    vol = 128
    rng = np.random.default_rng(0)
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(16)), out_shape=(vol,) * 3, one_hot=True)
    labels = jnp.asarray(rng.integers(0, 16, size=(1, vol, vol, vol, 1)),
                         jnp.int32)
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)

    def timeprog(name, f):
        t0 = time.time()
        c = f.lower(labels, jax.random.PRNGKey(0)).compile()
        compile_s = time.time() - t0
        r = c(labels, jax.random.PRNGKey(0))
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        outs = []
        for n in (3, 13):
            t0 = time.time()
            for i in range(n):
                r = c(labels, jax.random.PRNGKey(i))
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            outs.append(time.time() - t0)
        step = (outs[1] - outs[0]) / 10
        print(f'{name:9s}: {1e3 * step:7.1f} ms (compile {compile_s:.0f}s)',
              flush=True)

    which = sys.argv[1:] or ['off', 'identity', 'tap', 'on']

    orig = blur_ops.separable_blur3d

    for name in which:
        os.environ.pop('NEURITE_FUSED_BLUR', None)
        blur_ops.separable_blur3d = orig
        if name == 'on' or name == 'tap':
            os.environ['NEURITE_FUSED_BLUR'] = '1'
        if name == 'identity':
            os.environ['NEURITE_FUSED_BLUR'] = '1'

            def ident_blur(x, kernels, impl='auto', **k):
                return blur_ops._blur3d_jnp(
                    pallas_identity(x),
                    *[jnp.asarray(kk, x.dtype).reshape(-1)
                      for kk in kernels])
            blur_ops.separable_blur3d = ident_blur

        if name == 'tap':
            def make_fwd():
                def fwd(lab, key):
                    _, st = gen.apply(
                        gv, lab, rngs={'augment': key},
                        capture_intermediates=lambda m, _:
                            '/'.join(m.path) == 'blur',
                        mutable=['intermediates'])
                    return st['intermediates']['blur']['__call__'][0]
                return fwd
        else:
            def make_fwd():
                def fwd(lab, key):
                    return gen.apply(gv, lab, rngs={'augment': key})['image']
                return fwd

        timeprog(name, jax.jit(make_fwd()))


if __name__ == '__main__':
    main()
