"""Driver entry points stay importable / jittable (regression guard)."""

import sys
from pathlib import Path

import os

import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

# The driver compile-checks entry() and runs dryrun_multichip itself; these
# in-suite copies add ~4 min of CPU compiles, so they are opt-in.
pytestmark = pytest.mark.skipif(
    not os.environ.get('TD_RUN_SLOW_TESTS'),
    reason='slow; driver exercises __graft_entry__ directly (set TD_RUN_SLOW_TESTS=1)',
)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (2, 256, 384, 3)
    assert str(out[0].dtype) == 'uint8'


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, jax.device_count()))
