"""Per-op device profile of the bench.py parity UNet train step.

Round-5 ground truth for the padded-lane work (VERDICT r4 weak #1): before
building a lane-packed conv, name where the 30 ms actually goes — conv
fusions vs relayout copies vs pool/upsample vs adam — via trace_ops.

Usage: python benchmarks/unet_profile.py [top]
"""
import collections
import os
import re
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.trace_ops import profile_top_ops  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402


def main():
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    vol, nb_feats, nb_levels, nb_labels = 128, 16, 4, 4
    model = ne.models.unet(
        nb_features=nb_feats, input_shape=(vol,) * 3 + (1,),
        nb_levels=nb_levels, conv_size=3, nb_labels=nb_labels, feat_mult=2,
        nb_conv_per_level=2, dtype=jnp.bfloat16, conv_impl='auto')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, vol, vol, vol, 1)), jnp.float32)
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, nb_labels, size=(1, vol, vol, vol))),
        nb_labels)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))
    loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
    step = jax.jit(training.make_train_step(loss_fn))

    st, m = step(state, (x, y), jax.random.PRNGKey(1))
    _ = float(m['loss'])  # compile + sync

    holder = {'st': st}

    def run(i):
        holder['st'], mm = step(holder['st'], (x, y), jax.random.PRNGKey(i))
        return mm['loss']

    totals = profile_top_ops(run, steps=5, top=top)

    # category rollup: strip the .NN suffix and bucket by HLO opcode prefix
    cats = collections.Counter()
    for name, ms in totals.items():
        base = re.sub(r'\.\d+$', '', name)
        base = re.sub(r'\d+$', '', base)
        cats[base] += ms
    print('\n-- category rollup (ms/step) --')
    for name, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{ms:8.3f} ms  {name[:90]}')


if __name__ == '__main__':
    main()
