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


# All four patterns at strict=True, plus one strict=False case: `strict`
# only changes the XLA ring assembly (the Pallas interior never sees it),
# so the full 4x2 product re-runs the same interior kernel for no added
# coverage at ~10 s of interpret time per case.
@pytest.mark.parametrize('pattern,strict', [
    (BayerPattern.RGGB, True),
    (BayerPattern.BGGR, True),
    (BayerPattern.GRBG, True),
    (BayerPattern.GBRG, True),
    (BayerPattern.RGGB, False),
])
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


def test_rcd_interior_multiband_halo(rng):
    """bh=32 on a 160-row image forces n_rb=5 bands: exercises the
    band-halo concat (x_prev[bh-16:] / x_next[:16]) and roll-wrap
    containment, which the default bh=128 single-band cases never hit."""
    from tpu_darktable.kernels.rcd_interior import rcd_interior, site_parities

    h, w = 160, 128
    x = jnp.asarray(rng.random((h, w)).astype(np.float32))
    rp, bp = site_parities(BayerPattern.RGGB)
    out = np.asarray(
        rcd_interior(x, r_par=rp, b_par=bp, bh=32, interpret=True))
    ref = np.moveaxis(
        np.asarray(R._rcd_xla(x, BayerPattern.RGGB, False)), -1, 0)
    r = RING
    d = np.abs(out[:, r:-r, r:-r] - ref[:, r:-r, r:-r]).max()
    assert d < 1e-5, ('multi-band interior differs', d)


def test_rcd_pallas_dispatch_flag(rng):
    """use_pallas=False forces the XLA path; explicit True works on CPU
    (interpreted) through the public entry point."""
    h, w = 96, 128
    x = jnp.asarray(rng.random((h, w)).astype(np.float32))
    a = np.asarray(R.rcd_demosaic(x, BayerPattern.RGGB, use_pallas=False))
    b = np.asarray(R.rcd_demosaic(x, BayerPattern.RGGB, use_pallas=True))
    assert np.abs(a - b).max() < 1e-5
