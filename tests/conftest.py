"""Test configuration: force an 8-device virtual CPU mesh.

The environment boots an `axon` TPU plugin via sitecustomize and pins
jax_platforms programmatically, so the env-var override is not enough —
tests switch the platform through jax.config after import.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
