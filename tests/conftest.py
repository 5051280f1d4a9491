"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: in this environment the TPU platform plugin ignores the
`JAX_PLATFORMS` env var; only `jax.config.update('jax_platforms', ...)`
reliably selects CPU. `XLA_FLAGS` is read at backend initialization, so
setting it here (before any backend use) still applies.
"""

import os

# The persistent compilation cache is TPU-only: this jaxlib's CPU AOT
# loader rejects its own cached executables (spurious machine-feature
# mismatch on 'prefer-no-scatter') and aborts the process on load.
os.environ['HRFUSER_NO_JAX_CACHE'] = '1'

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    flags += ' --xla_force_host_platform_device_count=8'
if 'xla_cpu_collective' not in flags:
    # 8 virtual devices on few cores need far longer than the default 40 s
    # to reach collective rendezvous (XLA aborts the process otherwise)
    flags += (' --xla_cpu_collective_timeout_seconds=1200'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=1200'
              ' --xla_cpu_collective_call_warn_stuck_timeout_seconds=300')
os.environ['XLA_FLAGS'] = flags.strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# NOTE: do NOT set jax_default_matmul_precision here — combined with the
# donated multi-device train step it triggers an XLA:CPU abort in this
# jaxlib (and CPU matmuls default to f32 anyway).
