"""Parity vs literal CUDA-semantics oracles (the <=1e-3 budget, BASELINE.json).

The numpy oracles in oracles.py transliterate the reference kernels pixel by
pixel; the vectorized jnp implementations must match to float32 tolerance
on every pixel, borders included.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import bayer, demosaic, rcd
from tpu_darktable.ops.demosaic import _DIAMOND_KERNELS

import oracles

PATTERNS = list(bayer.BayerPattern)


def _test_mosaic(rng, h, w):
    """Structured + noise mosaic: exercises gradients and flat areas."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.4 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    base += rng.normal(0, 0.05, base.shape).astype(np.float32)
    return np.clip(base, 0.0, 1.0).astype(np.float32)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_bilinear_matches_oracle(rng, pattern):
    x = _test_mosaic(rng, 24, 28)
    ref = oracles.bilinear5x5_oracle(x.astype(np.float64), pattern, _DIAMOND_KERNELS)
    out = np.asarray(demosaic.bilinear5x5_demosaic(jnp.asarray(x), pattern))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_border_interpolate_matches_oracle(rng, pattern):
    x = _test_mosaic(rng, 20, 22)
    ref = oracles.border_interpolate_oracle(x.astype(np.float64), pattern, 3)
    out = np.asarray(demosaic.border_interpolate(jnp.asarray(x), pattern, 3))
    # oracle leaves interior zero; compare the ring only
    ring = np.ones((20, 22), dtype=bool)
    ring[3:-3, 3:-3] = False
    np.testing.assert_allclose(out[ring], ref[ring], atol=1e-5)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_ppg_matches_oracle(rng, pattern):
    x = _test_mosaic(rng, 26, 30)
    ref = oracles.ppg_oracle(x.astype(np.float64), pattern)
    out = np.asarray(demosaic.ppg_demosaic(jnp.asarray(x), pattern))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ppg_median_matches_oracle(rng):
    x = _test_mosaic(rng, 26, 30)
    p = bayer.BayerPattern.RGGB
    ref = oracles.ppg_oracle(x.astype(np.float64), p, median_threshold=30.0)
    out = np.asarray(demosaic.ppg_demosaic(jnp.asarray(x), p, median_threshold=30.0))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_rcd_matches_oracle(rng, pattern):
    # big enough that margin-7 interior, the border ladder, and the
    # half-grid alias zone are all exercised
    x = _test_mosaic(rng, 48, 52)
    ref = oracles.rcd_oracle(x.astype(np.float64), pattern)
    out = np.asarray(rcd.rcd_demosaic(jnp.asarray(x), pattern))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_rcd_matches_oracle_larger(rng):
    # 80x76: interior-32 region exists, multiple alias rows
    x = _test_mosaic(rng, 80, 76)
    p = bayer.BayerPattern.RGGB
    ref = oracles.rcd_oracle(x.astype(np.float64), p)
    out = np.asarray(rcd.rcd_demosaic(jnp.asarray(x), p))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_color_smoothing_matches_oracle(rng):
    from tpu_darktable.ops import postprocess

    rgb = rng.random((18, 20, 3)).astype(np.float32)
    ref = oracles.color_smoothing_oracle(rgb.astype(np.float64))
    out = np.asarray(postprocess.color_smoothing_pass(jnp.asarray(rgb)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_green_eq_local_matches_oracle(rng, pattern):
    from tpu_darktable.ops import postprocess

    rgb = (rng.random((18, 20, 3)) * 0.9).astype(np.float32)
    # threshold large enough that some pixels actually correct
    ref = oracles.green_eq_local_oracle(rgb.astype(np.float64), pattern, 0.5)
    out = np.asarray(postprocess.green_eq_local(jnp.asarray(rgb), pattern, 0.5))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_green_eq_global_matches_oracle(rng, pattern):
    from tpu_darktable.ops import postprocess

    rgb = (rng.random((18, 20, 3)) * 0.9).astype(np.float32)
    ref = oracles.green_eq_global_oracle(rgb.astype(np.float64), pattern)
    out = np.asarray(postprocess.green_eq_global(jnp.asarray(rgb), pattern))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize('sigma_s', [2.0, 3.5])
def test_bilateral_matches_oracle(rng, sigma_s):
    from tpu_darktable.ops import bilateral

    lum = (rng.random((24, 28)) * 0.9).astype(np.float32)
    ref = oracles.bilateral_oracle(lum.astype(np.float64), sigma_s, 0.2, 0.4)
    out = np.asarray(jax.jit(lambda x: bilateral.bilateral_process(x, sigma_s, 0.2, 0.4))(jnp.asarray(lum)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilateral_clamped_grid_matches_oracle(rng):
    """Grid-axis clamping (grid capped at 3000 cells, bilateral.cu:282-284):
    pixels past sigma*(n_cells-1) all land on the LAST cell with weight 1.0.
    At sigma_s=0.5 on a 1600-wide image gx clamps 3200 -> 3000, so pixels
    1500..1599 take the tail path of _axis_splat_operator (regression for
    the 40 GB dense-window gather this produced at 12MP sigma_s=1)."""
    from tpu_darktable.ops import bilateral

    lum = (rng.random((8, 1600)) * 0.9).astype(np.float32)
    gx, gy, gz = bilateral.compute_grid_size(1600, 8, 0.5, 0.25)
    assert gx == 3001  # clamped geometry, tail path exercised
    ref = oracles.bilateral_oracle(lum.astype(np.float64), 0.5, 0.25, 0.4)
    out = np.asarray(
        jax.jit(lambda x: bilateral.bilateral_process(x, 0.5, 0.25, 0.4))(jnp.asarray(lum))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_laplacian_matches_oracle(rng):
    from tpu_darktable.ops import laplacian

    lum = (rng.random((20, 24)) * 0.9 + 0.05).astype(np.float32)
    params = laplacian.LaplacianParams(sigma=0.2, shadows=0.6, highlights=1.4, clarity=0.3)
    ref = oracles.laplacian_oracle(lum.astype(np.float64), 6, 0.2, 0.6, 1.4, 0.3)
    out = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(x, params))(jnp.asarray(lum)))
    # fp16 storage in both; small accumulation-order differences remain
    np.testing.assert_allclose(out, ref, atol=2e-3)
