"""Decompose the config-#3 96.4ms step (VERDICT r4 item 2b).

Components measured separately at the head shape (160^3, trunk 8f/3lvl,
447M-param bf16 LC head), each with a device-side scan chain
(benchmarks/_timing.py — one dispatch per measurement, min over reps;
the i-indexed perturbation keeps the runtime from deduping identical
executions):
  trunk    : UNet trunk train step alone (no LC head)
  lc_fwd   : LC layer forward alone (Pallas v2 when NEURITE_PALLAS_LC=1)
  lc_grad  : LC layer fwd+bwd (dk + dx)
  adam     : adam update on the 447M-param pytree alone
  full     : the whole train step (the 96.4ms number)
Run twice: NEURITE_PALLAS_LC=0 and =1.
"""
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402
from benchmarks._timing import step_chain_ms  # noqa: E402

size = int(os.environ.get('LC_PROFILE_SIZE', '160'))
pdt = jnp.bfloat16


def timeit(fn, n=12, args=(), carry0=None):
    """fn(carry, i, *args) -> carry; big tensors ride `args` (HTTP-413
    rule, benchmarks/_timing.py). Scalar-carry callers must route the
    expensive value through lax.optimization_barrier before zeroing it —
    a bare `0. * value` lets XLA fold the chain to a constant and DCE the
    whole computation (measured 0.00 ms)."""
    c0 = jnp.zeros(()) if carry0 is None else carry0
    return step_chain_ms(fn, c0, n=n, args=args)


def alive(v):
    """Scalar that DEPENDS on v but costs nothing: barrier then zero."""
    return 0. * jax.lax.optimization_barrier(jnp.float32(v))


def report(name, ms):
    print(f'{name:10s}: {ms:7.2f} ms', flush=True)


class EncDecLC(nn.Module):
    with_lc: bool = True

    @nn.compact
    def __call__(self, x, training=False):
        u = ne.models.unet(nb_features=8, input_shape=(size,) * 3 + (1,),
                           nb_levels=3, conv_size=3, nb_labels=4,
                           feat_mult=2, final_pred_activation='linear',
                           dtype=jnp.bfloat16, conv_impl='auto', name='trunk')
        y = u(x, training=training)
        if self.with_lc:
            y = ne.layers.LocallyConnected3D(
                filters=1, kernel_size=3, padding='same', param_dtype=pdt,
                name='lc')(y)
        return y


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, size, size, size, 1)), jnp.float32)
    mse = lambda yt, yp: jnp.mean((yt - yp.astype(jnp.float32)) ** 2)  # noqa

    print(f"NEURITE_PALLAS_LC={os.environ.get('NEURITE_PALLAS_LC', '0')}",
          flush=True)
    which = sys.argv[1:] or ['trunk', 'lc_fwd', 'lc_grad', 'adam', 'full']

    if 'trunk' in which:
        trunk = EncDecLC(with_lc=False)
        st = training.create_train_state(trunk, jax.random.PRNGKey(0), x,
                                         optax.adam(1e-4))
        stp = jax.jit(training.make_train_step(mse))

        def run_trunk(st2, i, x, y):
            st2, m = stp(st2, (x, y), jax.random.fold_in(
                jax.random.PRNGKey(0), i))
            return st2
        report('trunk', timeit(run_trunk, args=(x, y), carry0=st))

    # LC layer alone at the head input shape (4 channels from the trunk)
    xl = jnp.asarray(rng.normal(size=(1, size, size, size, 4)), jnp.bfloat16)
    lc = ne.layers.LocallyConnected3D(filters=1, kernel_size=3,
                                      padding='same', param_dtype=pdt)
    v = lc.init(jax.random.PRNGKey(0), xl)

    if 'lc_fwd' in which:
        fwd = jax.jit(lambda v, xx: lc.apply(v, xx))
        report('lc_fwd', timeit(
            lambda t, i, v, xl: alive(
                fwd(v, xl + t.astype(xl.dtype)).ravel()[0]),
            args=(v, xl)))

    if 'lc_grad' in which:
        def loss(v, xx):
            return jnp.mean(lc.apply(v, xx).astype(jnp.float32) ** 2)
        gr = jax.jit(jax.grad(loss, argnums=(0, 1)))

        def run_grad(t, i, v, xl):
            gv, gx = gr(v, xl + t.astype(xl.dtype))
            return alive(gx.ravel()[0]) + alive(
                jax.tree.leaves(gv)[0].ravel()[0])
        report('lc_grad', timeit(run_grad, args=(v, xl)))

    if 'adam' in which:
        tx = optax.adam(1e-4)
        opt0 = tx.init(v['params'])
        g = jax.tree.map(jnp.ones_like, v['params'])

        # State-as-carry (like trunk/full): params+opt ride the chain, so
        # every step's update genuinely depends on the previous one — the
        # scalar-carry form measured ~0 (the chain collapsed).
        def upd(c, i, g):
            params, opt = c
            u, o = tx.update(g, opt, params)
            return (optax.apply_updates(params, u), o)
        report('adam', timeit(upd, args=(g,), carry0=(v['params'], opt0)))

    if 'full' in which:
        model = EncDecLC()
        st = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                         optax.adam(1e-4))
        stp = jax.jit(training.make_train_step(mse))

        def run_full(st2, i, x, y):
            st2, m = stp(st2, (x, y), jax.random.fold_in(
                jax.random.PRNGKey(0), i))
            return st2
        report('full', timeit(run_full, args=(x, y), carry0=st))


if __name__ == '__main__':
    main()
