"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI, so sharding/pjit tests run against
XLA's host-platform device emulation (SURVEY.md §4.4).  The environment may
pre-set JAX_PLATFORMS to a TPU platform; tests always run on CPU.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
