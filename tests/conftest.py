"""Test configuration: run everything on a virtual 8-device CPU mesh.

Set before JAX import so `jax.devices()` reports 8 CPU devices; sharding
tests exercise real (virtual) multi-device paths without TPU hardware.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'float32')
