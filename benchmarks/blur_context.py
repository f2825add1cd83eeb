"""
Diagnose the fused-blur in-context regression (VERDICT r2 item 5).

Round-1 finding: ops/blur.py measures 4.2x the XLA passes standalone
(0.86 vs 3.57ms at 128^3 k=7) but embedding the ONE call in the forward-only
synthesis program regressed it 34.8 -> 204.5ms. This script reproduces both
programs, times them, and dumps their post-optimization HLO for diffing the
custom-call boundary (copies/transposes/fusion breaks).

Usage: python benchmarks/blur_context.py [--hlo]
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
import neurite_tpu as ne  # noqa: E402


def build():
    vol = 128
    rng = np.random.default_rng(0)
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(16)), out_shape=(vol,) * 3, one_hot=True)
    labels = jnp.asarray(rng.integers(0, 16, size=(1, vol, vol, vol, 1)),
                         jnp.int32)
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)

    def make_fwd():
        # a FRESH function object per variant: jax caches traced jaxprs on
        # function identity, so reusing one `fwd` across env-flag toggles
        # silently reuses the first trace (the round-1 measurement trap)
        def fwd(lab, key):
            out = gen.apply(gv, lab, rngs={'augment': key})
            return out['image']
        return fwd

    return make_fwd, labels


def timeit(c, labels, n1=3, n2=13):
    outs = []
    for n in (n1, n2):
        key = jax.random.PRNGKey(0)
        r = None
        t0 = time.time()
        for i in range(n):
            r = c(labels, jax.random.PRNGKey(i))
        _ = np.asarray(r.ravel()[:1])
        outs.append(time.time() - t0)
    return (outs[1] - outs[0]) / (n2 - n1)


def main():
    make_fwd, labels = build()
    dump_hlo = '--hlo' in sys.argv

    results = {}
    for flag in ('0', '1'):
        if flag == '1':
            os.environ['NEURITE_FUSED_BLUR'] = '1'
        else:
            os.environ.pop('NEURITE_FUSED_BLUR', None)
        f = jax.jit(make_fwd())
        t0 = time.time()
        lowered = f.lower(labels, jax.random.PRNGKey(0))
        n_pallas = lowered.as_text().count('tpu_custom_call')
        c = lowered.compile()
        print(f'flag={flag} compile {time.time() - t0:.1f}s '
              f'(pallas calls in program: {n_pallas})', flush=True)
        if dump_hlo:
            with open(f'/tmp/hlo_synth_blur{flag}.txt', 'w') as fh:
                fh.write(c.as_text())
        # warm
        r = c(labels, jax.random.PRNGKey(0))
        _ = np.asarray(r.ravel()[:1])
        t = timeit(c, labels)
        results[flag] = t
        print(f'flag={flag}: {1e3 * t:.1f} ms/forward', flush=True)
    print('regression factor:', results['1'] / results['0'])


if __name__ == '__main__':
    main()
