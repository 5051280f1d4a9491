"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: in this environment the TPU platform plugin ignores the
`JAX_PLATFORMS` env var; only `jax.config.update('jax_platforms', ...)`
reliably selects CPU. `XLA_FLAGS` is read at backend initialization, so
setting it here (before any backend use) still applies.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'float32')
