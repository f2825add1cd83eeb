"""Config-#5 synth+train step across warp-engine routings (VERDICT r4
item 1): now that the custom-call blast radius measured GONE
(benchmarks/blur_context4.py), which Pallas placements win in-context?

Variants (warp_impl for the 5 SVF-integration squarings x label_warp_impl
for the full-res nearest label warp):
  onehot/onehot : the round-3 shipping config (45.2 ms step)
  window/onehot : Pallas v2 integration warps (64^3 C=3, shrinking windows)
  onehot/window : Pallas v2 nearest label warp (128^3, md=8+shift window)
  window/window : both

Also times the synthesis forward alone per variant, and checks pairwise
output parity at the shared PRNG key.
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402
from benchmarks._timing import step_chain_ms  # noqa: E402

SIZE, NB_LABELS = 128, 16


def build(warp_impl, label_warp_impl):
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(NB_LABELS)), out_shape=(SIZE,) * 3,
        one_hot=True, warp_impl=warp_impl, label_warp_impl=label_warp_impl)
    labels = jnp.asarray(np.random.default_rng(0).integers(
        0, NB_LABELS, size=(1, SIZE, SIZE, SIZE, 1)), jnp.int32)
    gen_vars = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                                  'augment': jax.random.PRNGKey(1)}, labels)
    return gen, gen_vars, labels


def main():
    which = sys.argv[1:] or ['onehot/onehot', 'window/onehot',
                             'onehot/window', 'window/window']
    fwd_outs = {}
    for name in which:
        wi, li = name.split('/')
        gen, gen_vars, labels = build(wi, li)

        fwd = jax.jit(lambda lab, key, g=gen, v=gen_vars: g.apply(
            v, lab, rngs={'augment': key}))
        out = fwd(labels, jax.random.PRNGKey(7))
        fwd_outs[name] = (np.asarray(out['image'], np.float32),
                          np.asarray(out['map'], np.float32))

        def fwd_step(t, i, labels, fwd=fwd):
            o = fwd(labels, jax.random.fold_in(jax.random.PRNGKey(3), i))
            # barrier keeps the synth program alive under XLA's 0*x fold
            return t + 0. * jax.lax.optimization_barrier(
                o['image'].astype(jnp.float32).ravel()[0])
        f_ms = step_chain_ms(fwd_step, jnp.zeros(()), n=12, args=(labels,))

        unet = ne.models.unet(
            nb_features=16, input_shape=(SIZE,) * 3 + (1,), nb_levels=4,
            conv_size=3, nb_labels=NB_LABELS, feat_mult=2,
            nb_conv_per_level=2, dtype=jnp.bfloat16, conv_impl='auto')
        state = training.create_train_state(
            unet, jax.random.PRNGKey(0),
            jnp.zeros((1,) + (SIZE,) * 3 + (1,)), optax.adam(1e-3))
        loss = ne.losses.SoftDice(check_input_limits=False).loss
        base_step = training.make_train_step(loss)

        def synth_step(state, labels, key, gen=gen, gen_vars=gen_vars):
            out = gen.apply(gen_vars, labels, rngs={'augment': key})
            return base_step(state, (out['image'], out['map']), key)

        jstep = jax.jit(synth_step)

        def run(st, i, labels, jstep=jstep):
            st2, m = jstep(st, labels,
                           jax.random.fold_in(jax.random.PRNGKey(9), i))
            return st2
        s_ms = step_chain_ms(run, state, n=12, args=(labels,))
        print(f'{name:15s}: fwd {f_ms:6.2f} ms   step {s_ms:6.2f} ms '
              f'= {1e3 / s_ms:5.2f} vol/s', flush=True)

    base = which[0]
    for name in which[1:]:
        di = float(np.max(np.abs(fwd_outs[name][0] - fwd_outs[base][0])))
        dm = float(np.max(np.abs(fwd_outs[name][1] - fwd_outs[base][1])))
        print(f'parity {name} vs {base}: image {di:.2e}  map {dm:.2e}',
              flush=True)


if __name__ == '__main__':
    main()
