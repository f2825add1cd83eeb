"""
Streaming-statistics layers (mean / covariance over the data stream).

Capability parity with reference `neurite/tf/layers.py:1915-2096`
(MeanStream/CovStream), re-designed TPU-first: the hidden in-call weight
assignment (`layers.py:1965-1969`) becomes an explicit flax mutable
collection 'stream_stats' — pure under jit, and exact under data parallelism
because the batch reductions are global sums when the batch axis is sharded
(SPMD reduces across the mesh automatically).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _mean_update(pre_mean, pre_count, x, pre_cap, axis_name=None):
    """Cap-weighted streaming mean (ref `layers.py:2059-2073`). With
    `axis_name` the batch sum/count are `lax.psum`-ed over that mesh axis
    (exact global-batch semantics under shard_map/pmap; under GSPMD jit the
    reductions are already global and axis_name must stay None)."""
    this_sum = jnp.sum(x, 0)
    this_bs = jnp.asarray(jnp.shape(x)[0], jnp.float32)
    if axis_name is not None:
        this_sum = jax.lax.psum(this_sum, axis_name)
        this_bs = jax.lax.psum(this_bs, axis_name)
    new_count = pre_count + this_bs
    alpha = this_bs / jnp.minimum(new_count, pre_cap)
    new_mean = pre_mean * (1 - alpha) + (this_sum / this_bs) * alpha
    return new_mean, new_count


class MeanStream(nn.Module):
    """
    Maintain a streaming mean with cap-weighted updates; inference returns the
    stored mean scaled by min(1, count/cap).

    Parity: reference `layers.py:1915-1975`. Updates happen when called with
    `training=True` and the 'stream_stats' collection mutable.
    """
    cap: float = 100
    axis_name: 'str | None' = None   # psum axis for shard_map/pmap DP

    @nn.compact
    def __call__(self, x, training=False):
        mean = self.variable('stream_stats', 'mean',
                             lambda: jnp.zeros(x.shape[1:], jnp.float32))
        count = self.variable('stream_stats', 'count',
                              lambda: jnp.zeros((1,), jnp.float32))

        batch = jnp.shape(x)[0]
        if not training:
            scale = jnp.minimum(1., count.value / self.cap)
            return scale * jnp.broadcast_to(mean.value[None],
                                            (batch, *mean.value.shape))

        an = None if self.is_initializing() else self.axis_name
        new_mean, new_count = _mean_update(mean.value, count.value, x,
                                           float(self.cap), an)
        if not self.is_initializing():
            mean.value = new_mean
            count.value = new_count
        scale = jnp.minimum(1., new_count / self.cap)
        return scale * jnp.broadcast_to(new_mean[None],
                                        (batch, *new_mean.shape))


class CovStream(nn.Module):
    """
    Maintain a streaming covariance (over flattened inputs, V x V — beware
    memory for large V, as the reference warns implicitly).

    Parity: reference `layers.py:1978-2056`.
    """
    cap: float = 100
    axis_name: 'str | None' = None   # psum axis for shard_map/pmap DP

    @nn.compact
    def __call__(self, x, training=False):
        v = int(np.prod(x.shape[1:]))
        mean = self.variable('stream_stats', 'mean',
                             lambda: jnp.zeros(x.shape[1:], jnp.float32))
        cov = self.variable('stream_stats', 'cov',
                            lambda: jnp.zeros((v, v), jnp.float32))
        count = self.variable('stream_stats', 'count',
                              lambda: jnp.zeros((1,), jnp.float32))

        batch = jnp.shape(x)[0]
        if not training:
            scale = jnp.minimum(1., count.value / self.cap)
            return scale * jnp.broadcast_to(cov.value[None],
                                            (batch, v, v))

        an = None if self.is_initializing() else self.axis_name
        new_mean, new_count = _mean_update(mean.value, count.value, x,
                                           float(self.cap), an)
        this_bs = jnp.asarray(batch, jnp.float32)
        prev_count = count.value

        x_flat = x.reshape(batch, -1)  # B x V
        c_delta = jnp.einsum('bi,bj->bij', x_flat, x_flat)  # B x V x V

        c_sum = jnp.sum(c_delta, 0)
        if an is not None:
            c_sum = jax.lax.psum(c_sum, an)
            this_bs = jax.lax.psum(this_bs, an)
        prev_cap = jnp.minimum(prev_count, self.cap)
        c = cov.value * (prev_cap - 1) + c_sum
        new_cov = c / (prev_cap + this_bs - 1)

        if not self.is_initializing():
            count.value = new_count
            mean.value = new_mean
            cov.value = new_cov
        scale = jnp.minimum(1., new_count / self.cap)
        return scale * jnp.broadcast_to(new_cov[None], (batch, v, v))
