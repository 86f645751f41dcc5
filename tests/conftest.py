'''Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run against
``--xla_force_host_platform_device_count=8`` per SURVEY.md §4.
'''
import os

# Must run before jax is imported anywhere.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(12345)
