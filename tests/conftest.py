"""
Test configuration: force a local 8-virtual-device CPU platform so multi-chip
sharding (pjit / shard_map / halo exchange) is exercised without TPU pods, per
SURVEY.md §4 item 5.

Note: this environment preloads a TPU PJRT plugin ("axon") via sitecustomize
and pins jax_platforms — env vars alone do NOT override it, and its remote
compile path is far too slow for a test suite. We therefore update the jax
config directly before any backend is initialized.
"""
import os

# must come before backend init: virtual multi-device CPU mesh for sharding tests
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

# persistent compilation cache: 1-core box, repeated jit compiles dominate test time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
