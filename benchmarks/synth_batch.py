"""
Synthesis batch-scaling diagnosis (VERDICT r2 item 8): measure the fused
synth+UNet train step at batch 1/2/4 with the one-hot engines' scan unroll
at 1 vs 4 (NEURITE_WARP_UNROLL). Round-1 finding: batch 4 measured 500ms =
8.0 vol/s vs batch 1's 11.3 — the block scan serializes batch work.

Usage: python benchmarks/synth_batch.py [batch ...]
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


def build(batch, vol=128):
    rng = np.random.default_rng(0)
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(16)), out_shape=(vol,) * 3, one_hot=True)
    labels = jnp.asarray(rng.integers(0, 16, size=(batch, vol, vol, vol, 1)),
                         jnp.int32)
    unet = ne.models.unet(nb_features=16, input_shape=(vol, vol, vol, 1),
                          nb_levels=4, conv_size=3, nb_labels=16, feat_mult=2,
                          nb_conv_per_level=2, dtype=jnp.bfloat16,
                          conv_impl='auto')
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)
    st = training.create_train_state(
        unet, jax.random.PRNGKey(0), jnp.zeros((1,) + (vol,) * 3 + (1,)),
        optax.adam(1e-3))
    loss = ne.losses.SoftDice(check_input_limits=False).loss
    bstep = training.make_train_step(loss)

    @jax.jit
    def sstep(st, lab, key):
        out = gen.apply(gv, lab, rngs={'augment': key})
        return bstep(st, (out['image'], out['map']), key)

    return sstep, st, labels


def measure(batch):
    sstep, st, labels = build(batch)
    t0 = time.time()
    st, mm = sstep(st, labels, jax.random.PRNGKey(2))
    _ = float(mm['loss'])
    compile_s = time.time() - t0

    def run(n, st):
        t0 = time.time()
        for i in range(n):
            st, mm = sstep(st, labels, jax.random.PRNGKey(10 + i))
        _ = float(mm['loss'])
        return time.time() - t0, st

    ta, st = run(3, st)
    tb, st = run(13, st)
    step = (tb - ta) / 10
    return step, batch / step, compile_s


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 4]
    unroll = os.environ.get('NEURITE_WARP_UNROLL', '1')
    for b in batches:
        step, vps, cs = measure(b)
        print(f'unroll={unroll} batch={b}: {1e3 * step:7.1f} ms/step '
              f'{vps:6.2f} vol/s (compile {cs:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
