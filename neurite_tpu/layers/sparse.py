"""
Sparse-observation layers.

Capability parity with reference `neurite/tf/layers.py:635-739`
(SpatiallySparse_Dense), re-designed TPU-first: the per-sample masked
pseudo-inverse is a batched d x d linear solve (`jnp.linalg.solve`) instead of
an explicit `tf.matrix_inverse` — numerically safer and MXU-batched.

Citation (as in the reference): Dalca AV, Guttag J, Sabuncu MR. Anatomical
Priors in Convolutional Networks for Unsupervised Biomedical Segmentation,
CVPR 2018.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _normal_init(stddev=0.05, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)
    return init


class SpatiallySparse_Dense(nn.Module):
    """
    Densely-connected layer for sparsely-observed inputs, usable in both
    directions with shared weights:

    - encode: call with (y, y_mask) -> [B, output_len]; per sample, rows of
      the decode matrix W = (M^T M)^-1 M^T are masked by the observation mask
      and the masked normal equations are re-solved (ref `layers.py:705-711`).
    - decode: call with (x,) -> [B, *input_shape]; plain x @ W.

    Parity: reference `layers.py:635-739`.
    """
    input_shape: Sequence[int]  # image shape (no batch)
    output_len: int
    use_bias: bool = False
    kernel_initializer: Any = None
    bias_initializer: Any = None

    @nn.compact
    def __call__(self, args):
        if not isinstance(args, (list, tuple)):
            args = [args]

        D = int(np.prod(self.input_shape))
        kernel_init = self.kernel_initializer or _normal_init()
        kernel = self.param('mult_kernel', kernel_init, (D, self.output_len))

        # W = (M^T M)^-1 M^T, tracking the current kernel (differentiable)
        M = kernel  # D x d
        mtm = M.T @ M  # d x d
        W = jnp.linalg.solve(mtm, M.T)  # d x D

        bias = None
        if self.use_bias:
            bias_init = self.bias_initializer or _normal_init()
            bias = self.param('bias_kernel', bias_init, (self.output_len,))

        if len(args) == 2:  # encode path: inputs [y, mask]
            y, y_mask = args
            a_fact = y.shape[-1] // y_mask.shape[-1]
            if a_fact > 1:
                y_mask = jnp.repeat(y_mask, a_fact, axis=-1)
            y_flat = y.reshape(y.shape[0], -1)            # N x D
            mask_flat = y_mask.reshape(y_mask.shape[0], -1)  # N x D

            Wo = W.T[None] * mask_flat[..., None]         # N x D x d
            WoT = jnp.swapaxes(Wo, 1, 2)                  # N x d x D
            wotwo = jnp.einsum('ndD,nDe->nde', WoT, Wo)   # N x d x d
            rhs = jnp.einsum('ndD,nD->nd', WoT, y_flat)   # N x d
            res = jnp.linalg.solve(wotwo, rhs[..., None])[..., 0]  # N x d
            if self.use_bias:
                res = res + bias[None]
            return res

        # decode path: input [x]
        x_data = args[0]
        x_flat = x_data.reshape(x_data.shape[0], -1)      # N x d
        if self.use_bias:
            x_flat = x_flat - bias
        res = x_flat @ W                                  # N x D
        return res.reshape(-1, *self.input_shape)
