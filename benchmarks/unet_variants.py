"""In-step A/B of the round-5 UNet step variants on real TPU.

Times the bench.py parity train step (128^3, 16 feats, bf16, z-decomp
convs) under combinations of:
  - NEURITE_PALLAS_POOL: XLA reduce_window pool vs fused Pallas pool
  - NEURITE_DW_IMPL: per-tap dw convs vs single-pass gstack/conv3d

Device-side scan-chain timing (benchmarks/_timing.py). Usage:
  python benchmarks/unet_variants.py pool0:pertap pool1:gstack ...
(default: the full matrix of interest)
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks._timing import step_chain_ms  # noqa: E402


def measure(pool, dw):
    os.environ['NEURITE_PALLAS_POOL'] = pool
    os.environ['NEURITE_DW_IMPL'] = dw
    import neurite_tpu as ne
    from neurite_tpu import training
    vol, nb_labels = 128, 4
    model = ne.models.unet(
        nb_features=16, input_shape=(vol,) * 3 + (1,), nb_levels=4,
        conv_size=3, nb_labels=nb_labels, feat_mult=2, nb_conv_per_level=2,
        dtype=jnp.bfloat16, conv_impl='auto')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, vol, vol, vol, 1)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(
        rng.integers(0, nb_labels, size=(1, vol, vol, vol))), nb_labels)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))
    loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
    step = jax.jit(training.make_train_step(loss_fn))
    st, m = step(state, (x, y), jax.random.PRNGKey(1))
    loss = float(m['loss'])

    def run_step(st2, i, xx, yy):
        st2, _ = step(st2, (xx, yy),
                      jax.random.fold_in(jax.random.PRNGKey(1), i))
        return st2
    ms = step_chain_ms(run_step, st, n=8, reps=3, args=(x, y))
    return ms, loss


def main():
    configs = sys.argv[1:] or ['0:pertap', '0:gstack', '0:conv3d',
                               '1:pertap', '1:gstack']
    for cfg in configs:
        pool, dw = cfg.split(':')
        try:
            ms, loss = measure(pool, dw)
            print(f'pool={pool} dw={dw}: {ms:7.2f} ms/step '
                  f'({1000. / ms:6.2f} vol/s)  loss0={loss:.6f}', flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue matrix
            print(f'pool={pool} dw={dw}: FAILED {type(exc).__name__}: '
                  f'{str(exc)[:300]}', flush=True)


if __name__ == '__main__':
    main()
