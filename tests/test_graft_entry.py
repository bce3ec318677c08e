"""Driver entry points stay importable / jittable (regression guard)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (2, 256, 384, 3)
    assert str(out[0].dtype) == 'uint8'


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, jax.device_count()))
