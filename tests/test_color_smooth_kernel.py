"""Fused color-smoothing kernel == the per-pass XLA path (interpret mode).

The Pallas cascade (kernels/color_smooth.py) must be BIT-identical to
n x color_smoothing_pass - same zero-fill boundary reads, same clamp
ordering (postprocess.cu:24-78)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import postprocess as pp


@pytest.mark.parametrize('n_passes', [1, 3, 5])
def test_fused_matches_per_pass(rng, n_passes):
    rgb = jnp.asarray(rng.random((70, 100, 3)).astype(np.float32) - 0.1)
    a = np.asarray(pp.color_smoothing(rgb, n_passes, use_pallas=False))
    b = np.asarray(
        pp.color_smoothing(rgb, n_passes, use_pallas=True, _pallas_interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_fused_small_image_and_band_alignment(rng):
    """Sizes around the band height (bh=32): h < bh, h == bh, h % bh != 0."""
    for h, w in [(20, 40), (32, 64), (50, 96)]:
        rgb = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
        a = np.asarray(pp.color_smoothing(rgb, 3, use_pallas=False))
        b = np.asarray(
            pp.color_smoothing(rgb, 3, use_pallas=True, _pallas_interpret=True)
        )
        np.testing.assert_array_equal(a, b)


def test_zero_passes_identity(rng):
    rgb = jnp.asarray(rng.random((16, 24, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pp.color_smoothing(rgb, 0)), np.asarray(rgb))
