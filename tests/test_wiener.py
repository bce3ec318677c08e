"""Wiener denoise: reconstruction identity at zero noise, denoising effect."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import wiener


@pytest.mark.parametrize('tile_size,overlap', [(16, 2), (16, 4), (32, 2), (32, 4)])
def test_zero_noise_is_identity(rng, tile_size, overlap):
    # gain -> 1 when sigma = 0, so windowed overlap-add must reconstruct.
    img = rng.random((48, 56, 3)).astype(np.float32)
    out = np.asarray(
        wiener.wiener_denoise(jnp.asarray(img), 0.0, tile_size=tile_size, overlap_factor=overlap)
    )
    np.testing.assert_allclose(out, img, atol=2e-5)


def test_single_channel(rng):
    img = rng.random((40, 40, 1)).astype(np.float32)
    out = np.asarray(wiener.wiener_denoise(jnp.asarray(img), 0.0))
    np.testing.assert_allclose(out, img, atol=2e-5)


def test_denoising_reduces_noise(rng):
    clean = np.full((64, 64, 1), 0.5, dtype=np.float32)
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    out = np.asarray(wiener.wiener_denoise(jnp.asarray(noisy), 0.05))
    assert np.std(out) < 0.5 * np.std(noisy)
    # mean preserved
    np.testing.assert_allclose(out.mean(), noisy.mean(), atol=0.01)


def test_per_channel_sigmas(rng):
    noisy = (0.5 + rng.normal(0, 0.05, (64, 64, 3))).astype(np.float32)
    sig = np.array([0.05, 0.0, 0.05], dtype=np.float32)
    out = np.asarray(wiener.wiener_denoise(jnp.asarray(noisy), jnp.asarray(sig)))
    # channel 1 untouched, others smoothed
    np.testing.assert_allclose(out[..., 1], noisy[..., 1], atol=2e-5)
    assert np.std(out[..., 0]) < np.std(noisy[..., 0])


def test_estimate_channel_noise(rng):
    img = rng.normal(0.5, 0.1, (256, 256, 3)).astype(np.float32)
    sig = np.asarray(wiener.estimate_channel_noise(jnp.asarray(img), stride=2))
    assert sig.shape == (3,)
    # laplacian of iid noise has std sigma*sqrt(20); MAD estimate scales accordingly
    assert np.all(sig > 0.2) and np.all(sig < 0.8)
