"""Fused RCD interior kernel vs the XLA path (interpret mode on CPU).

The ring (border ladder + strict-alias pixels, outer 12 px) must be EXACT:
it runs through the same XLA code with injected global stale planes.  The
interior runs through the Pallas cascade and agrees to float-reassociation
(Mosaic lowers divides as reciprocal-multiplies; ~2e-7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import rcd as R
from tpu_darktable.ops.bayer import BayerPattern

RING = R._RING


@pytest.mark.parametrize('pattern', list(BayerPattern))
@pytest.mark.parametrize('strict', [True, False])
def test_rcd_pallas_matches_xla(pattern, strict, rng):
    h, w = 128, 160
    x = jnp.asarray(rng.random((h, w)).astype(np.float32))
    ref = np.asarray(R._rcd_xla(x, pattern, strict))
    out = np.asarray(R._rcd_pallas(x, pattern, strict))
    ring = np.ones((h, w), bool)
    ring[RING:-RING, RING:-RING] = False
    d = np.abs(out - ref).max(axis=-1)
    assert d[ring].max() == 0.0, ('ring differs', d[ring].max())
    assert d[~ring].max() < 1e-5, ('interior differs', d[~ring].max())


def test_rcd_pallas_dispatch_flag(rng):
    """use_pallas=False forces the XLA path; explicit True works on CPU
    (interpreted) through the public entry point."""
    h, w = 96, 128
    x = jnp.asarray(rng.random((h, w)).astype(np.float32))
    a = np.asarray(R.rcd_demosaic(x, BayerPattern.RGGB, use_pallas=False))
    b = np.asarray(R.rcd_demosaic(x, BayerPattern.RGGB, use_pallas=True))
    assert np.abs(a - b).max() < 1e-5
