"""
BASELINE config #3 with TENSOR-PARALLEL head weights (VERDICT r2 item 7):
the LocallyConnected3D kernel [V, k^3*Cin, Cout] is per-voxel, so sharding V
over the mesh 'space' axis alongside the input's spatial sharding needs no
collectives in the layer; per-device weight AND adam-moment memory drop by
the space factor.

Runs on the virtual 8-device CPU mesh (no multi-chip hardware here):
reports per-device shard sizes (the memory claim) and pins numerical parity
vs the unsharded step. Step-time numbers on CPU are not meaningful —
docs/DESIGN.md carries the single-chip head timings (benchmarks/lc_head.py).

Run: python benchmarks/lc_head_tp.py [size=48]
"""

import os
import sys

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_platforms', 'cpu')

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import neurite_tpu as ne  # noqa: E402
from neurite_tpu import parallel, training  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cin, cout, k = 2, 1, 3

    class LCHead(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            return ne.layers.LocallyConnected3D(
                filters=cout, kernel_size=k, padding='same',
                name='lc')(x)

    model = LCHead()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, size, size, size, cin)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, size, size, size, cout)), jnp.float32)
    state = training.create_train_state(model, jax.random.PRNGKey(0), x,
                                        optax.adam(1e-3))
    V = size ** 3
    kernel_bytes = V * (k ** 3) * cin * cout * 4
    step = training.make_train_step(lambda t, p: jnp.mean((p - t) ** 2))
    s1, m1 = jax.jit(step)(state, (x, y), jax.random.PRNGKey(1))

    space = 2
    mesh = parallel.create_mesh(data=8 // space, space=space)
    # the head-style branch stores the kernel TRANSPOSED [O, k^3*Cin, V]
    # (ops/lc_tap.py), so the voxel axis to shard is LAST
    run = parallel.make_sharded_train_step(
        step, mesh, space_axis=1, donate_state=False,
        param_specs={"['lc']['kernel']": P(None, None, 'space'),
                     "['lc']['bias']": P('space')})
    s2, m2 = run(state, parallel.shard_batch((x, y), mesh, space_axis=1),
                 jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    kshard = {s.data.nbytes for s in s2.params['lc']['kernel']
              .addressable_shards}
    mshard = {s.data.nbytes for s in s2.opt_state[0].mu['lc']['kernel']
              .addressable_shards}
    assert kshard == {kernel_bytes // space}, (kshard, kernel_bytes)
    print(f'LC head {size}^3: kernel {kernel_bytes/1e6:.1f}MB '
          f'(adam state 3x) -> per-device {kernel_bytes/space/1e6:.1f}MB '
          f'kernel + {3 * kernel_bytes/space/1e6:.1f}MB with moments '
          f'(space={space}); loss parity '
          f'{float(m1["loss"]):.6f}=={float(m2["loss"]):.6f} OK')
    # config #3 head (lc_head.py): 160^3 voxels x k^3*Cin=108 x 1 = 447M
    # params = 1.79GB f32 kernel + 3.58GB adam moments, replicated.
    full = 160 ** 3 * 27 * 4 * 1 * 4
    print(f'config #3 extrapolation (160^3, 447M params): kernel+moments '
          f'{3 * full/1e9:.2f}GB replicated -> {3 * full/8/1e9:.2f}GB/device '
          f'at space=8')


if __name__ == '__main__':
    main()
