"""Microbenchmark: measure synthesis forward at 128^3 with warp_impl auto vs onehot."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import neurite_tpu as ne

size, nb_labels = 128, 16
labels = jnp.asarray(np.random.default_rng(0).integers(
    0, nb_labels, size=(1, size, size, size, 1)), jnp.int32)

impls = sys.argv[1:] or ['auto', 'onehot']
outs = {}
for impl in impls:
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(nb_labels)), out_shape=(size,) * 3,
        one_hot=True, warp_impl=impl, return_def=True)
    t0 = time.time()
    gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                                  'augment': jax.random.PRNGKey(1)}, labels)
    fwd = jax.jit(lambda lab, key: gen.apply(gen_vars, lab,
                                             rngs={'augment': key}))
    out = fwd(labels, jax.random.PRNGKey(2))
    img0 = np.asarray(out['image'])
    compile_s = time.time() - t0
    outs[impl] = (img0, np.asarray(out['def']))

    def run(n):
        t0 = time.time()
        o = None
        for i in range(n):
            o = fwd(labels, jax.random.PRNGKey(2))
        _ = np.asarray(o['image'].ravel()[:1])
        return time.time() - t0
    t1, t2 = run(2), run(8)
    dt = (t2 - t1) / 6
    print(f'{impl:8s} fwd {dt*1000:8.2f} ms  (compile {compile_s:.0f}s)',
          flush=True)

if len(outs) == 2:
    a, b = outs['auto'], outs['onehot']
    print('def maxdiff', np.abs(a[1] - b[1]).max(),
          'img mismatch frac', np.mean(~np.isclose(a[0], b[0], atol=1e-5)))
