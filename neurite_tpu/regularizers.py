"""
Weight regularizers.

Parity: reference `neurite/tf/regularizers.py:35-45`.
"""

import jax.numpy as jnp

from neurite_tpu.utils.core import soft_delta, flatten


def soft_l0_wrap(wt=1.):
    """
    Soft-L0 penalty encouraging zero weights: wt * (soft count of non-zero
    weights) / (total weights), where the soft zero-count is sum(soft_delta(x)).

    Parity: reference `neurite/tf/regularizers.py:35-45`.
    """

    def soft_l0(x):
        """maximize the number of 0 weights"""
        nb_weights = jnp.asarray(jnp.size(x), jnp.float32)
        nb_zero_wts = jnp.sum(soft_delta(flatten(x)))
        return wt * (nb_weights - nb_zero_wts) / nb_weights

    return soft_l0
