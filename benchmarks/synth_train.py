"""Microbenchmark: BASELINE config #5 — on-device synthesis -> 3-D UNet."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import neurite_tpu as ne
from neurite_tpu import training

size, nb_labels = 128, 16
batch = int(os.environ.get('SYNTH_BATCH', 1))
aff = {}
if os.environ.get('SYNTH_ROTATED'):      # realistic SynthMorph affine draw
    aff = dict(aff_rotate=15, aff_scale=0.1, aff_shear=0.05, aff_shift=10)
gen = ne.models.labels_to_image_new(
    labels_in=list(range(nb_labels)), out_shape=(size,) * 3, one_hot=True,
    warp_impl=os.environ.get('SYNTH_WARP_IMPL', 'auto'),
    label_warp_impl=os.environ.get('SYNTH_LABEL_WARP_IMPL', 'auto'), **aff)
unet = ne.models.unet(nb_features=16, input_shape=(size,) * 3 + (1,),
                      nb_levels=4, conv_size=3, nb_labels=nb_labels,
                      feat_mult=2, nb_conv_per_level=2,
                      dtype=jnp.bfloat16, conv_impl='auto')

labels = jnp.asarray(np.random.default_rng(0).integers(
    0, nb_labels, size=(batch, size, size, size, 1)), jnp.int32)
t0 = time.time()
gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                              'augment': jax.random.PRNGKey(1)}, labels)
state = training.create_train_state(
    unet, jax.random.PRNGKey(0), jnp.zeros((batch,) + (size,) * 3 + (1,)),
    optax.adam(1e-3))
loss = ne.losses.SoftDice(check_input_limits=False).loss
base_step = training.make_train_step(loss)


@jax.jit
def synth_step(state, labels, key):
    out = gen.apply(gen_vars, labels, rngs={'augment': key})
    return base_step(state, (out['image'], out['map']), key)


state, m = synth_step(state, labels, jax.random.PRNGKey(2))
l0 = float(m['loss'])
print(f'compile+first step {time.time()-t0:.0f}s loss {l0:.4f}', flush=True)


def run(n, state):
    t0 = time.time()
    for i in range(n):
        state, m = synth_step(state, labels, jax.random.PRNGKey(10 + i))
    _ = float(m['loss'])
    return time.time() - t0, state


t1, state = run(3, state)
t2, state = run(13, state)
dt = (t2 - t1) / 10
print(f'synth+train step {dt*1000:.1f} ms -> {batch/dt:.2f} vol/s/chip',
      flush=True)
