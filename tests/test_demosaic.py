"""Demosaic algorithms: constant-image exactness, smooth-image accuracy."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import bayer, demosaic, rcd, postprocess


def _mosaic(rgb, pattern):
    """fc-consistent mosaic synthesis (unlike the bug-compatible
    bayer.rgb_to_bayer, which misplaces greens for GRBG/GBRG)."""
    h, w = rgb.shape[:2]
    codes = bayer.fc_map(h, w, pattern)
    chan = np.where(codes == 0, 0, np.where(codes == 2, 2, 1))
    out = np.take_along_axis(np.asarray(rgb), chan[..., None], axis=2)[..., :1]
    return jnp.asarray(out)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.3 + 0.2 * np.sin(xx / 40.0)
    g = 0.5 + 0.1 * np.cos(yy / 50.0)
    b = 0.4 + 0.15 * np.sin((xx + yy) / 60.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 1)


PATTERNS = list(bayer.BayerPattern)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_bilinear_constant(pattern):
    mosaic = jnp.full((32, 32, 1), 0.5, dtype=jnp.float32)
    out = np.asarray(demosaic.bilinear5x5_demosaic(mosaic, pattern))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_bilinear_smooth_accuracy(pattern):
    # The reference's per-site kernel order swaps the two green kernels for
    # BGGR/GBRG (demosaic at G sites mixes up which neighbor axis holds R vs
    # B, bilinear.cu:28-61 + bayer_device.h:19-33).  We replicate that, so
    # those patterns are validated on an R==B image where the swap is
    # invisible; RGGB/GRBG get the full-color check.
    rgb = _smooth_rgb(64, 64)
    if pattern in (bayer.BayerPattern.BGGR, bayer.BayerPattern.GBRG):
        rgb[..., 2] = rgb[..., 0]
    mosaic = _mosaic(rgb, pattern)
    out = np.asarray(demosaic.bilinear5x5_demosaic(mosaic, pattern))
    err = np.abs(out - rgb)[4:-4, 4:-4].max()
    assert err < 0.02, err


@pytest.mark.parametrize('pattern', PATTERNS)
def test_ppg_constant(pattern):
    mosaic = jnp.full((64, 64, 1), 0.5, dtype=jnp.float32)
    out = np.asarray(demosaic.ppg_demosaic(mosaic, pattern))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_ppg_smooth_accuracy(pattern):
    rgb = _smooth_rgb(64, 64)
    mosaic = _mosaic(rgb, pattern)
    out = np.asarray(demosaic.ppg_demosaic(mosaic, pattern))
    err = np.abs(out - rgb)[4:-4, 4:-4].max()
    assert err < 0.02, err


def test_ppg_median_path_runs():
    rgb = _smooth_rgb(32, 32)
    mosaic = _mosaic(rgb, bayer.BayerPattern.RGGB)
    out = np.asarray(demosaic.ppg_demosaic(mosaic, bayer.BayerPattern.RGGB, median_threshold=50.0))
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


@pytest.mark.parametrize('pattern', PATTERNS)
def test_rcd_constant(pattern):
    mosaic = jnp.full((96, 96, 1), 0.5, dtype=jnp.float32)
    out = np.asarray(rcd.rcd_demosaic(mosaic, pattern))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


@pytest.mark.parametrize('pattern', PATTERNS)
def test_rcd_smooth_accuracy(pattern):
    rgb = _smooth_rgb(96, 96)
    mosaic = _mosaic(rgb, pattern)
    out = np.asarray(rcd.rcd_demosaic(mosaic, pattern))
    err = np.abs(out - rgb)[8:-8, 8:-8].max()
    assert err < 0.02, err


def test_rcd_rejects_odd_size():
    with pytest.raises(ValueError):
        rcd.rcd_demosaic(jnp.zeros((33, 32)), bayer.BayerPattern.RGGB)


def test_border_interpolate_constant():
    out = np.asarray(
        demosaic.border_interpolate(jnp.full((16, 16), 0.25, dtype=jnp.float32),
                                    bayer.BayerPattern.RGGB, 3)
    )
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_color_smoothing_preserves_constant():
    rgb = jnp.full((32, 32, 3), 0.5, dtype=jnp.float32)
    out = np.asarray(postprocess.color_smoothing_pass(rgb))
    # zero-padded border biases edge medians; interior must be exact
    np.testing.assert_allclose(out[2:-2, 2:-2], 0.5, atol=1e-6)


def test_green_eq_global_balances():
    p = bayer.BayerPattern.RGGB
    h = w = 32
    codes = bayer.fc_map(h, w, p)
    rows = np.arange(h)[:, None] * np.ones((1, w), dtype=int)
    g = np.full((h, w), 0.5, dtype=np.float32)
    g1 = (codes == 1) & (rows % 2 == 0)
    g2 = (codes == 1) & (rows % 2 == 1)
    g[g1] = 0.4  # imbalanced greens
    g[g2] = 0.6
    rgb = np.stack([np.zeros_like(g), g, np.zeros_like(g)], axis=-1)
    out = np.asarray(postprocess.green_eq_global(jnp.asarray(rgb), p))
    np.testing.assert_allclose(out[g1, 1], 0.6, atol=1e-5)
    np.testing.assert_allclose(out[g2, 1], 0.6, atol=1e-6)


def test_postprocess_pipeline_runs():
    rgb = jnp.asarray(_smooth_rgb(32, 32))
    out = np.asarray(
        postprocess.postprocess(
            rgb, bayer.BayerPattern.RGGB,
            color_smoothing_passes=3, green_eq_global_enabled=True,
            green_eq_local_enabled=True,
        )
    )
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_sort9_network_matches_sort(rng):
    from tpu_darktable.ops._stencil import sort9

    vals = [jnp.asarray(rng.random((7, 5)).astype(np.float32)) for _ in range(9)]
    got = np.stack([np.asarray(v) for v in sort9(vals)])
    ref = np.sort(np.stack([np.asarray(v) for v in vals]), axis=0)
    np.testing.assert_array_equal(got, ref)


def test_dual_demosaic(rng):
    from tpu_darktable.ops import rcd as rcd_mod

    rgb = _smooth_rgb(96, 96)
    # add a high-detail region
    rgb[40:56, 40:56] = rng.random((16, 16, 3)).astype(np.float32)
    mosaic = _mosaic(rgb, bayer.BayerPattern.RGGB)
    out = np.asarray(rcd_mod.dual_demosaic(mosaic, bayer.BayerPattern.RGGB))
    assert out.shape == (96, 96, 3)
    assert np.isfinite(out).all()
    # blend factor: sigmoid at the inflexion point
    bf = float(rcd_mod.calc_blend_factor(jnp.float32(0.15), 0.15))
    np.testing.assert_allclose(bf, 0.5, atol=1e-6)


def test_scharr_mask_constant_is_zero():
    from tpu_darktable.ops.rcd import calc_scharr_mask

    m = np.asarray(calc_scharr_mask(jnp.full((16, 16), 0.5)))
    np.testing.assert_allclose(m, 0.0, atol=1e-7)
