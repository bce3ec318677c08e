"""Argument-validation surface: bad inputs raise actionable errors, not
cryptic jax tracer failures (reference beartype + TORCH_CHECK layer,
denoise.py:26-32, rcd.cu:602-606)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_darktable as td
from tpu_darktable.ops import bilateral, color, laplacian, rcd, tonemap, wiener
from tpu_darktable.ops.bayer import BayerPattern


@pytest.fixture
def rgb():
    return jnp.zeros((8, 12, 3), jnp.float32)


def test_color_channel_guards(rgb):
    with pytest.raises(RuntimeError, match='3 channels'):
        color.compute_luminance(jnp.zeros((8, 12, 2)))
    with pytest.raises(RuntimeError, match='3 channels'):
        color.color_transform_3x3(jnp.zeros((8, 12)), np.eye(3))
    with pytest.raises(RuntimeError, match=r'\(3, 3\)'):
        color.color_transform_3x3(rgb, np.eye(4))
    with pytest.raises(RuntimeError, match='must match'):
        color.modify_luminance(rgb, jnp.zeros((4, 12)))


def test_tonemap_guards(rgb):
    params = td.TonemapParameters()
    with pytest.raises(RuntimeError, match='3 channels'):
        tonemap.reinhard_tonemap(jnp.zeros((8, 12)), jnp.zeros(5), params)
    with pytest.raises(RuntimeError, match='3 channels'):
        tonemap.compute_image_metrics(jnp.zeros((8, 12, 4)))
    with pytest.raises(RuntimeError):
        tonemap.compute_image_bounds(jnp.zeros((12,)))


def test_mosaic_guards():
    with pytest.raises(RuntimeError, match='single-channel mosaic'):
        rcd.rcd_demosaic(jnp.zeros((8, 12, 3)), BayerPattern.RGGB)
    with pytest.raises(RuntimeError, match='single-channel mosaic'):
        td.bilinear5x5_demosaic(jnp.zeros((8,)), BayerPattern.RGGB)


def test_white_balance_guards():
    with pytest.raises(RuntimeError, match=r'\(3,\)'):
        td.apply_white_balance(jnp.zeros((8, 12)), jnp.zeros(4), BayerPattern.RGGB)
    with pytest.raises(RuntimeError, match='at least 2 dimensions'):
        td.apply_white_balance(jnp.zeros(12), jnp.zeros(3), BayerPattern.RGGB)


def test_plane_guards(rgb):
    with pytest.raises(RuntimeError, match='2-D'):
        bilateral.bilateral_process(rgb, 2.0, 0.2, 0.4)
    with pytest.raises(RuntimeError, match='2-D'):
        laplacian.local_laplacian(rgb)


def test_wiener_guards():
    with pytest.raises(RuntimeError, match='C in'):
        wiener.wiener_denoise(jnp.zeros((8, 12, 2)), 0.05)
    with pytest.raises(ValueError, match='overlap_factor'):
        wiener.wiener_denoise(jnp.zeros((64, 64, 1)), 0.05, overlap_factor=3)


def test_guards_pass_under_jit(rgb):
    """Guards only read static shape info, so they work on tracers."""
    import jax

    out = jax.jit(color.compute_luminance)(rgb)
    assert out.shape == (8, 12)
