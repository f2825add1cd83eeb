"""
Where does bench.py's compile_s go? (VERDICT r3 item 6: 35s r1 -> 118s r2.)

Times trace (.lower()) and XLA compile (.compile()) separately for the
headline UNet-128^3 train step and ablations:

  auto     : conv_impl='auto' (z-decomposed 2-D convs) — the bench config
  native   : conv_impl='native' (XLA conv3d) — r1's cheaper-to-compile form
  fwd      : forward pass only (no grad/adam) under 'auto'
  sgd      : 'auto' with plain SGD (is adam's HLO the multiplier?)

Run with a COLD cache (JAX_COMPILATION_CACHE_DIR pointed somewhere fresh)
or the numbers are disk hits, not compiles.
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/jax_cache_compile_profile')

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402

vol, batch, nb_labels = 128, 1, 4
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(batch, vol, vol, vol, 1)), jnp.float32)
y = jax.nn.one_hot(jnp.asarray(
    rng.integers(0, nb_labels, size=(batch, vol, vol, vol))), nb_labels)
loss_fn = ne.losses.SoftDice(check_input_limits=False).loss


def build(conv_impl, opt, fwd_only=False):
    model = ne.models.unet(
        nb_features=16, input_shape=(vol, vol, vol, 1), nb_levels=4,
        conv_size=3, nb_labels=nb_labels, feat_mult=2, nb_conv_per_level=2,
        dtype=jnp.bfloat16, conv_impl=conv_impl)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x, opt)
    if fwd_only:
        def fn(state, batch_, key):
            return loss_fn(batch_[1],
                           state.apply_fn({'params': state.params}, batch_[0],
                                          training=True, rngs={'dropout': key}))
        return jax.jit(fn), (state, (x, y), jax.random.PRNGKey(1))
    step = jax.jit(training.make_train_step(loss_fn), donate_argnums=(0,))
    return step, (state, (x, y), jax.random.PRNGKey(1))


def profile(name, jitfn, args):
    t0 = time.time()
    lowered = jitfn.lower(*args)
    t_trace = time.time() - t0
    hlo_lines = lowered.as_text().count('\n')
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f'{name:8s}: trace {t_trace:6.1f}s  compile {t_compile:6.1f}s  '
          f'stablehlo {hlo_lines} lines', flush=True)
    return compiled


which = sys.argv[1:] or ['auto', 'native', 'fwd', 'sgd']
for name in which:
    if name == 'auto':
        fn, args = build('auto', optax.adam(1e-3))
    elif name == 'native':
        fn, args = build('native', optax.adam(1e-3))
    elif name == 'fwd':
        fn, args = build('auto', optax.adam(1e-3), fwd_only=True)
    elif name == 'sgd':
        fn, args = build('auto', optax.sgd(1e-3))
    else:
        raise SystemExit(f'unknown variant {name}')
    profile(name, fn, args)
