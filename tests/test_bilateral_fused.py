"""Fully-fused bilateral splat/blur/slice kernel vs the XLA fast path
(interpret mode on CPU).  Same formula, different assembly order - float
rounding only."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import bilateral as B
from tpu_darktable.kernels.bilateral_fused import bilateral_fused

_slow = pytest.mark.skipif(
    not os.environ.get('TD_RUN_SLOW_TESTS'),
    reason='v1 kernel is an opt-in negative result; s=8 interpret is ~30 s')


@pytest.mark.parametrize('h,w,s,sr', [
    (128, 192, 2, 0.2),
    (128, 256, 2, 0.1),   # gz = 11
    pytest.param(64, 128, 8, 0.2, marks=_slow),
])
def test_fused_matches_xla_fast_path(h, w, s, sr, rng):
    lum = jnp.asarray((rng.random((h, w)) * 0.95).astype(np.float32))
    ref = np.asarray(B.bilateral_process(lum, float(s), sr, 0.4,
                                         _use_pallas_blur=False))
    _, _, gz = B.compute_grid_size(w, h, float(s), sr)
    ld = bilateral_fused(lum, s=s, gz=gz, sigma_r=float(sr), bg=16,
                         interpret=True)
    out = np.asarray(jnp.maximum(0.0, lum + (-0.4 * sr * 4.0) * ld))
    assert np.abs(out - ref).max() < 1e-5


def test_fused_via_public_entry(rng):
    """bilateral_process routes through the fused kernel when interpret is
    forced; result matches the XLA chain."""
    lum = jnp.asarray((rng.random((96, 128)) * 0.9).astype(np.float32))
    ref = np.asarray(B.bilateral_process(lum, 2.0, 0.2, 0.4,
                                         _use_pallas_blur=False))
    out = np.asarray(B.bilateral_process(lum, 2.0, 0.2, 0.4,
                                         _pallas_interpret=True))
    assert np.abs(out - ref).max() < 1e-5
