"""Microbenchmark: rotated-affine synthesis — shear-engine vs gather label warp.

Same pipeline as benchmarks/synth_train.py but with a realistic SynthMorph
augmentation draw (rotation/scale/shear/shift), forward only, comparing the
label-warp routes at 128^3.
"""
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

for impl in ('gather', 'onehot'):
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(nb_labels)), out_shape=(size,) * 3,
        one_hot=True, aff_rotate=15, aff_scale=0.1, aff_shear=0.05,
        aff_shift=10, label_warp_impl=impl)
    t0 = time.time()
    vs = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)
    step = jax.jit(lambda v, l, k: gen.apply(v, l, rngs={'augment': k}))
    out = step(vs, labels, jax.random.PRNGKey(2))
    _ = np.asarray(out['image'].ravel()[:1])
    print(f'{impl}: compile {time.time()-t0:.0f}s', flush=True)

    def run(n):
        t0 = time.time()
        o = None
        for i in range(n):
            o = step(vs, labels, jax.random.PRNGKey(10 + i))
        _ = np.asarray(o['image'].ravel()[:1])
        return time.time() - t0

    t1, t2 = run(2), run(10)
    dt = (t2 - t1) / 8
    print(f'{impl}: synth forward {dt*1000:.1f} ms', flush=True)
