"""
Custom-call blast radius, part 4 (VERDICT r3 item 3): mitigation probes.

blur_context2/3 established that the MERE PRESENCE of a tpu_custom_call
flips the 128^3 synthesis program into a degraded compile mode (+430%
runtime, compile 17s -> 139s), while UNet (+1%) and warp chains (+11%)
are unaffected. This script measures candidate mitigations:

  off       : pure-XLA synthesis forward (control, ~40ms)
  identity  : pallas identity in the dataflow (control regression, ~213ms)
  split     : TWO jitted programs — jit(synth fwd, pure XLA) composed with
              jit(pallas identity) at the boundary. The custom call lives in
              its own tiny program; measures the composition overhead
              (expected: off + one extra HBM round-trip of the 8MB image).
  warp2     : synth fwd with the LAST stage (image blur) moved into the
              second program along with the custom call — the shape the
              real mitigation takes when a Pallas kernel replaces a stage.

Flag probes are run by the caller (each needs a fresh process/TPU client):
  LIBTPU_INIT_ARGS='--xla_tpu_enable_latency_hiding_scheduler=true' \
      python benchmarks/blur_context2.py off identity
with JAX_COMPILATION_CACHE_DIR pointed at a variant-specific dir so cached
programs from other flag sets cannot mask the effect.
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import neurite_tpu as ne  # noqa: E402
from benchmarks.blur_context2 import pallas_identity  # noqa: E402


def main():
    vol = 128
    rng = np.random.default_rng(0)
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(16)), out_shape=(vol,) * 3, one_hot=True)
    labels = jnp.asarray(rng.integers(0, 16, size=(1, vol, vol, vol, 1)),
                         jnp.int32)
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, labels)

    def fwd(lab, key):
        return gen.apply(gv, lab, rngs={'augment': key})['image']

    def timeprog(name, call):
        """call(lab, key) -> array; two-point fit over (3, 13) reps."""
        t0 = time.time()
        r = call(labels, jax.random.PRNGKey(0))
        _ = np.asarray(r.ravel()[:1])
        compile_s = time.time() - t0
        outs = []
        for n in (3, 13):
            t0 = time.time()
            for i in range(n):
                r = call(labels, jax.random.PRNGKey(i))
            _ = np.asarray(r.ravel()[:1])
            outs.append(time.time() - t0)
        step = (outs[1] - outs[0]) / 10
        print(f'{name:9s}: {1e3 * step:7.1f} ms (compile+first '
              f'{compile_s:.0f}s)', flush=True)

    which = sys.argv[1:] or ['off', 'split', 'identity']

    for name in which:
        if name == 'off':
            timeprog('off', jax.jit(fwd))
        elif name == 'identity':
            def fwd_ident(lab, key):
                img = fwd(lab, key)
                return pallas_identity(img[..., 0])[..., None]
            timeprog('identity', jax.jit(fwd_ident))
        elif name == 'split':
            stage1 = jax.jit(fwd)
            stage2 = jax.jit(
                lambda img: pallas_identity(img[..., 0])[..., None])

            def composed(lab, key):
                return stage2(stage1(lab, key))
            timeprog('split', composed)
        else:
            raise SystemExit(f'unknown variant {name}')


if __name__ == '__main__':
    main()
