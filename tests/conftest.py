"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's host-only tier-1 test strategy (tests/README:1-4):
no accelerator needed; multi-chip sharding is validated on virtual CPU
devices exactly as the driver's dryrun does.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
