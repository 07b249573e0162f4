"""Test config: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(XLA host-platform device-count flag); real-TPU behavior is exercised
by bench.py and the driver's dryrun hooks.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config
# API too (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
