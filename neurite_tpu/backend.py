"""
Single source of truth for backend gating.

Round-3 audit found the Pallas routing split across two inconsistent
checks (`jax.default_backend() == 'tpu'` in ops vs `in ('tpu', 'axon')` in
layers) — on a platform whose PJRT plugin reports a different name the two
paths silently disagreed. Every TPU-only fast path now asks this module.
"""

import jax

# Platform names that execute on TPU hardware. The tunneled v5e pool used
# for benchmarking reports 'tpu'; 'axon' is the tunnel plugin's own name on
# runtimes that expose it directly.
TPU_PLATFORMS = ('tpu', 'axon')


def is_tpu():
    """True when the default JAX backend executes on TPU hardware."""
    try:
        return jax.default_backend() in TPU_PLATFORMS
    except RuntimeError:  # no backend could initialize at all
        return False
