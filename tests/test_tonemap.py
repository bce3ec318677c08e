"""Tonemap statistics + curve spot checks vs reference formulas."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import tonemap


def test_bounds(rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    b = np.asarray(tonemap.compute_image_bounds([jnp.asarray(img)], stride=8))
    sampled = img[::8, ::8]
    np.testing.assert_allclose(b, [sampled.min(), sampled.max()], atol=1e-7)


def test_metrics_constant_image():
    img = jnp.full((64, 64, 3), 0.5, dtype=jnp.float32)
    m = np.asarray(tonemap.compute_image_metrics([img], stride=8))
    np.testing.assert_allclose(m[1], 0.5, atol=1e-6)  # linear mean
    np.testing.assert_allclose(m[2:], 0.5, atol=1e-6)  # rgb mean
    np.testing.assert_allclose(m[0], np.log(0.5), atol=1e-5)  # log mean


def test_metrics_saturation_mask():
    img = np.full((64, 64, 3), 0.995, dtype=np.float32)
    img[::2] = 0.5
    m = np.asarray(tonemap.compute_image_metrics([jnp.asarray(img)], stride=1))
    # saturated rows excluded
    np.testing.assert_allclose(m[1], 0.5, atol=1e-6)


def test_map_key_range():
    mk_dark = float(tonemap._compute_map_key(jnp.float32(-9.21034)))
    mk_bright = float(tonemap._compute_map_key(jnp.float32(0.0)))
    np.testing.assert_allclose(mk_dark, 1.0, atol=1e-5)
    np.testing.assert_allclose(mk_bright, 0.3, atol=1e-6)


def _manual_reinhard(rgb, metrics, gamma, intensity, light_adapt):
    log_range = 9.21034
    normalized = np.clip(-metrics[0] / log_range, 0, 1)
    map_key = 0.3 + 0.7 * normalized**1.4
    global_mean = metrics[2:5]
    adapt_mean = global_mean + light_adapt * (rgb - global_mean)
    adapt = (adapt_mean / np.exp(intensity)) ** map_key
    t = rgb / (adapt + rgb)
    return np.clip(np.round(np.maximum(t, 0) ** (1 / gamma) * 255), 0, 255)


def test_reinhard_matches_manual(rng):
    rgb = (rng.random((16, 16, 3)) * 0.9 + 0.05).astype(np.float32)
    metrics = np.array([-1.5, 0.3, 0.3, 0.35, 0.25], dtype=np.float32)
    params = tonemap.TonemapParameters(gamma=1.2, intensity=1.0, light_adapt=0.8, vibrance=0.0)
    out = np.asarray(tonemap.reinhard_tonemap(jnp.asarray(rgb), jnp.asarray(metrics), params))
    manual = _manual_reinhard(rgb.astype(np.float64), metrics, 1.2, 1.0, 0.8)
    assert out.dtype == np.uint8
    # vibrance=0 still does a LAB round-trip clip; allow 1 count of difference
    assert np.abs(out.astype(int) - manual).max() <= 1


def test_aces_shapes_and_dtype(rng):
    rgb = (rng.random((8, 8, 3))).astype(np.float32)
    params = tonemap.TonemapParameters()
    out = tonemap.aces_tonemap(jnp.asarray(rgb), params)
    assert out.shape == (8, 8, 3) and out.dtype == jnp.uint8
    metrics = tonemap.compute_image_metrics([jnp.asarray(rgb)])
    out2 = tonemap.aces_tonemap(jnp.asarray(rgb), params, metrics)
    assert out2.shape == (8, 8, 3)


def test_linear_tonemap_clamped(rng):
    rgb = (rng.random((8, 8, 3)) * 3.0).astype(np.float32)
    metrics = np.asarray(tonemap.compute_image_metrics([jnp.asarray(rgb)]))
    out = np.asarray(
        tonemap.linear_tonemap(jnp.asarray(rgb), jnp.asarray(metrics), tonemap.TonemapParameters())
    )
    assert out.dtype == np.uint8


def test_metrics_dict_roundtrip():
    m = jnp.asarray([-1.0, 0.4, 0.3, 0.4, 0.5], dtype=jnp.float32)
    d = tonemap.metrics_to_dict(m)
    back = np.asarray(tonemap.metrics_from_dict(d))
    np.testing.assert_allclose(back, np.asarray(m))
