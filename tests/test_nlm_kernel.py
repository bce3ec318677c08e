"""Fused NLM kernel == the fori_loop XLA path (interpret mode).

The box filter associates differently (separable vs direct 9-term sum),
so agreement is to float rounding, not bitwise."""

import numpy as np
import pytest

from tpu_darktable.ops import nlm


@pytest.mark.parametrize('shape', [(70, 96, 3), (64, 96), (40, 48, 3)])
def test_fused_matches_fori_loop(rng, shape):
    x = rng.random(shape).astype(np.float32)
    a = np.asarray(nlm.nlm_denoise(x, 0.1, use_pallas=False))
    b = np.asarray(nlm.nlm_denoise(x, 0.1, use_pallas=True, _pallas_interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_fused_radii_variants(rng):
    x = rng.random((48, 64, 3)).astype(np.float32)
    for sr, pr in [(2, 2), (1, 1), (3, 1)]:
        a = np.asarray(nlm.nlm_denoise(x, 0.15, search_radius=sr, patch_radius=pr,
                                       use_pallas=False))
        b = np.asarray(nlm.nlm_denoise(x, 0.15, search_radius=sr, patch_radius=pr,
                                       use_pallas=True, _pallas_interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.parametrize('shape,levels', [((70, 96, 3), 4), ((64, 80, 3), 3),
                                          ((96, 128), 4), ((33, 40, 2), 4)])
def test_wavelet_fused_matches_per_level(rng, shape, levels):
    """kernels/wavelet.py == the per-level a-trous XLA path, including the
    per-level edge-pad semantics at every image border."""
    x = rng.random(shape).astype(np.float32)
    a = np.asarray(nlm.wavelet_denoise(x, 0.05, levels=levels, use_pallas=False))
    b = np.asarray(nlm.wavelet_denoise(x, 0.05, levels=levels, use_pallas=True,
                                       _pallas_interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_wavelet_deep_levels_fall_back(rng):
    """levels=5 exceeds the band cone; must still work via the XLA path."""
    x = rng.random((80, 96, 3)).astype(np.float32)
    a = np.asarray(nlm.wavelet_denoise(x, 0.05, levels=5, use_pallas=True,
                                       _pallas_interpret=True))
    b = np.asarray(nlm.wavelet_denoise(x, 0.05, levels=5, use_pallas=False))
    np.testing.assert_array_equal(a, b)
