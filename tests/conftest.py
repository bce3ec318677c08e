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

# Persistent compilation cache for the CPU test backend.  The suite is
# dominated by hundreds of small XLA compiles serialized on this host's
# single core; caching reuses the compiled programs across runs (the
# numerics still execute every time - only the compile is skipped, and
# any code change reshapes the HLO and recompiles).  Kept separate from
# the package's TPU cache dir.
jax.config.update(
    'jax_compilation_cache_dir',
    os.path.expanduser('~/.cache/tpu_darktable/jax_cache_cpu'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_enable_xla_caches', 'all')

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    # Deterministic per-test seed derived from the test id: adding or
    # removing a test file can never reshuffle another test's draws (a
    # shared session generator made every test's input depend on
    # collection order).
    import zlib

    return np.random.default_rng(zlib.adler32(request.node.nodeid.encode()))
