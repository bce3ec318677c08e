"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes - conftest is imported before any test
module, and the env vars only take effect at first jax import.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

# The env var alone does not always win over installed TPU plugins;
# jax.config is authoritative when set before backend initialization.
import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)
