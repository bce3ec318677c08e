"""Color conversions: round trips + formula spot checks vs reference math."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import color


def test_srgb_linear_roundtrip(rng):
    x = rng.random((64, 3)).astype(np.float32)
    back = color.linear_to_srgb(color.srgb_to_linear(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_rgb_lab_roundtrip(rng):
    x = rng.random((32, 32, 3)).astype(np.float32)
    back = color.lab_to_rgb(color.rgb_to_lab(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-5)


def test_lab_normalization():
    # white -> L=1 (normalized /100), a=b=0
    lab = np.asarray(color.rgb_to_lab(jnp.asarray([[1.0, 1.0, 1.0]])))
    np.testing.assert_allclose(lab, [[1.0, 0.0, 0.0]], atol=1e-4)


def test_hsl_roundtrip(rng):
    x = rng.random((128, 3)).astype(np.float32)
    back = color.hsl_to_rgb(color.rgb_to_hsl(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_vibrance_zero_is_noop_modulo_clip(rng):
    x = rng.random((64, 3)).astype(np.float32)
    out = color.modify_vibrance(jnp.asarray(x), 0.0)
    np.testing.assert_allclose(np.asarray(out), x, atol=3e-5)


def test_modify_luminance(rng):
    x = rng.random((16, 16, 3)).astype(np.float32) * 0.8 + 0.1
    lum = color.compute_luminance(jnp.asarray(x))
    out = color.modify_luminance(jnp.asarray(x), lum)
    np.testing.assert_allclose(np.asarray(out), x, atol=3e-5)


def test_log_luminance_roundtrip(rng):
    x = rng.random((16, 16, 3)).astype(np.float32) * 0.8 + 0.1
    eps = 1e-4
    loglum = color.compute_log_luminance(jnp.asarray(x), eps=1e-6)
    # modify adds eps inside exp (reference semantics); feed log(l) - eps
    out = color.modify_log_luminance(jnp.asarray(x), loglum - eps, eps=eps)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_lab_dedup_helpers_exact(rng):
    """rgb_to_lab_with_clipped_l / lab_modify_luminance must reproduce the
    plain compute/modify pair bitwise, INCLUDING out-of-range inputs (the
    fused pipeline feeds unclipped normalize_image output to the denoise
    bracket)."""
    x = (rng.random((32, 48, 3)).astype(np.float32) * 1.5 - 0.25)  # [-0.25, 1.25)
    lab, lum = color.rgb_to_lab_with_clipped_l(jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(lum), np.asarray(color.compute_luminance(jnp.asarray(x)))
    )
    np.testing.assert_array_equal(
        np.asarray(lab), np.asarray(color.rgb_to_lab(jnp.asarray(x)))
    )
    new_l = np.asarray(lum) * 0.9 + 0.01
    np.testing.assert_array_equal(
        np.asarray(color.lab_modify_luminance(lab, jnp.asarray(new_l))),
        np.asarray(color.modify_luminance(jnp.asarray(x), jnp.asarray(new_l))),
    )


def test_color_transform_3x3_identity(rng):
    x = rng.random((8, 8, 3)).astype(np.float32)
    out = color.color_transform_3x3(jnp.asarray(x), np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-7)


def test_rgb_to_gray_rec601():
    g = np.asarray(color.rgb_to_gray(jnp.asarray([[1.0, 0.0, 0.0]])))
    np.testing.assert_allclose(g, [0.299], atol=1e-7)
