'''Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run against
``--xla_force_host_platform_device_count=8`` per SURVEY.md §4.
'''
import os

# Must run before jax initializes anywhere.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

# The sandbox's axon site-hook force-prepends the remote-TPU platform to
# jax_platforms, overriding the env var - override it back explicitly.
import jax
jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', 'tests must run on the virtual CPU mesh'

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(12345)
