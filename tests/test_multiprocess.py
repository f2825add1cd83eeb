"""
Multi-process multi-chip correctness (VERDICT r2 #8; SURVEY §5.8).

- a REAL 2-process `jax.distributed.initialize` run on CPU backends (2
  virtual devices per process -> a 4-device global 'data' mesh): each
  process feeds its local half of the global batch through
  `shard_batch_multihost`, runs one DP train step, and must agree with the
  single-process 4-device run of the same global batch bit-for-bit;
- preemption: a fit loop killed at step k and resumed from the checkpoint
  (state + step + rng + data-iterator position) reproduces the
  uninterrupted run exactly.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
import numpy as np
import optax
import neurite_tpu as ne
from neurite_tpu import parallel, training

assert jax.device_count() == 4, jax.devices()
assert jax.local_device_count() == 2

mesh = parallel.create_mesh(data=4)
model = ne.models.unet(nb_features=2, input_shape=(8, 8, 1), nb_levels=2,
                       conv_size=3, nb_labels=2)
state = training.create_train_state(model, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8, 8, 1)),
                                    optax.sgd(1e-2))
rng = np.random.default_rng(7)
gx = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
gy = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(4, 8, 8))]
pid = jax.process_index()
local = (gx[pid * 2:(pid + 1) * 2], gy[pid * 2:(pid + 1) * 2])

loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
step = parallel.make_sharded_train_step(
    training.make_train_step(loss_fn), mesh)
batch = parallel.shard_batch_multihost(local, mesh, space_axis=None)
state, metrics = step(state, batch, jax.random.PRNGKey(1))
print('LOSS %.10f' % float(metrics['loss']), flush=True)
'''

SINGLE = r'''
import os
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import optax
import neurite_tpu as ne
from neurite_tpu import parallel, training

mesh = parallel.create_mesh(data=4)
model = ne.models.unet(nb_features=2, input_shape=(8, 8, 1), nb_levels=2,
                       conv_size=3, nb_labels=2)
state = training.create_train_state(model, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8, 8, 1)),
                                    optax.sgd(1e-2))
rng = np.random.default_rng(7)
gx = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
gy = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(4, 8, 8))]

loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
step = parallel.make_sharded_train_step(
    training.make_train_step(loss_fn), mesh)
batch = parallel.shard_batch_multihost((gx, gy), mesh, space_axis=None)
state, metrics = step(state, batch, jax.random.PRNGKey(1))
print('LOSS %.10f' % float(metrics['loss']), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(code, args=(), env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    # two local CPU devices per process
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    env['JAX_COMPILATION_CACHE_DIR'] = '/tmp/jax_cache'
    if env_extra:
        env.update(env_extra)
    return subprocess.Popen([sys.executable, '-c', code, *map(str, args)],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _loss_of(out):
    for line in out.splitlines():
        if line.startswith('LOSS '):
            return float(line.split()[1])
    return None


def test_two_process_distributed_train_step():
    """2-process jax.distributed DP step == single-process 4-device step."""
    coord = f'localhost:{_free_port()}'
    procs = [_run(WORKER, (coord, i)) for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{so}\n{se[-3000:]}'
    losses = [_loss_of(so) for so, _ in outs]
    assert None not in losses, outs
    assert losses[0] == losses[1]

    ref = _run(SINGLE, env_extra={'XLA_FLAGS': ''})
    so, se = ref.communicate(timeout=600)
    assert ref.returncode == 0, f'single-proc failed:\n{so}\n{se[-3000:]}'
    ref_loss = _loss_of(so)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-6)


def test_preemption_resume_mid_fit(tmp_path):
    """fit killed at step 3 + checkpoint resume == uninterrupted 6 steps."""
    import optax

    import neurite_tpu as ne
    from neurite_tpu import training

    model = ne.models.unet(nb_features=2, input_shape=(8, 8, 1), nb_levels=2,
                           conv_size=3, nb_labels=2)
    rng = np.random.default_rng(3)
    xs = rng.normal(size=(8, 2, 8, 8, 1)).astype(np.float32)
    ys = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(8, 2, 8, 8))]

    def data_iter(start_step=0):
        def gen():
            i = start_step
            while True:
                yield (jnp.asarray(xs[i % 8]), jnp.asarray(ys[i % 8]))
                i += 1
        return gen()

    def fresh_state():
        return training.create_train_state(model, jax.random.PRNGKey(0),
                                           jnp.zeros((1, 8, 8, 1)),
                                           optax.adam(1e-3))

    loss_fn = ne.losses.SoftDice(check_input_limits=False).loss
    step = training.make_train_step(loss_fn)
    key = jax.random.PRNGKey(11)

    # uninterrupted run
    full, hist_full = training.fit(fresh_state(), step, data_iter(), 6, key,
                                   log_every=0)

    # preempted at step 3: checkpoint carries state + step; rng is the same
    # fixed key (fit folds in the global step index)
    part, _ = training.fit(fresh_state(), step, data_iter(), 3, key)
    ckpt = str(tmp_path / 'ckpt')
    training.save_checkpoint(ckpt, part, extra={'next_step': 3})

    restored, extra = training.restore_checkpoint(ckpt, fresh_state())
    k = int(extra['next_step'])
    resumed, _ = training.fit(restored, step, data_iter(start_step=k), 3,
                              key, start_step=k)

    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
