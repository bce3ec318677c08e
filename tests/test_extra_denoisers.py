"""New capabilities beyond the reference: wavelet + NLM denoise, filmic tonemap."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops.nlm import nlm_denoise, wavelet_denoise
from tpu_darktable.ops import tonemap


def _noisy(rng, h=64, w=64, c=3, sigma=0.05):
    clean = np.full((h, w, c) if c else (h, w), 0.5, dtype=np.float32)
    return clean, (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)


def test_wavelet_denoise_reduces_noise(rng):
    clean, noisy = _noisy(rng)
    out = np.asarray(wavelet_denoise(jnp.asarray(noisy), 0.05))
    assert np.std(out - clean) < 0.5 * np.std(noisy - clean)
    np.testing.assert_allclose(out.mean(), 0.5, atol=0.01)


def test_wavelet_zero_sigma_identity(rng):
    _, noisy = _noisy(rng)
    out = np.asarray(wavelet_denoise(jnp.asarray(noisy), 0.0))
    np.testing.assert_allclose(out, noisy, atol=1e-5)


def test_wavelet_preserves_edges(rng):
    img = np.full((64, 64), 0.2, dtype=np.float32)
    img[:, 32:] = 0.8
    out = np.asarray(wavelet_denoise(jnp.asarray(img), 0.02))
    # the step edge magnitude survives
    assert out[:, 40].mean() - out[:, 20].mean() > 0.55


def test_nlm_denoise_reduces_noise(rng):
    clean, noisy = _noisy(rng, sigma=0.04)
    out = np.asarray(nlm_denoise(jnp.asarray(noisy), 0.04))
    assert np.std(out - clean) < 0.5 * np.std(noisy - clean)


def test_nlm_mono_and_shape(rng):
    _, noisy = _noisy(rng, c=0, sigma=0.04)
    out = np.asarray(nlm_denoise(jnp.asarray(noisy), 0.04))
    assert out.shape == noisy.shape


def test_filmic_tonemap(rng):
    rgb = (rng.random((16, 16, 3)) * 2.0).astype(np.float32)
    params = tonemap.TonemapParameters(gamma=1.0, intensity=0.0)
    out = np.asarray(tonemap.filmic_tonemap(jnp.asarray(rgb), params))
    assert out.dtype == np.uint8
    # adaptive variant
    m = tonemap.compute_image_metrics([jnp.asarray(np.clip(rgb, 0, 1))])
    out2 = np.asarray(tonemap.filmic_tonemap(jnp.asarray(rgb), params, m))
    assert out2.shape == out.shape
    # monotone in input for gray ramps
    ramp = np.linspace(0, 4, 32, dtype=np.float32)[:, None, None] * np.ones((1, 1, 3), np.float32)
    r = np.asarray(tonemap.filmic_tonemap(jnp.asarray(ramp), params))
    assert (np.diff(r[:, 0, 0].astype(int)) >= 0).all()


def test_filmic_in_pipeline(rng):
    import tpu_darktable as td
    from tpu_darktable.ops import packed
    from tpu_darktable.pipeline import ImageProcessor
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper

    h, w = 64, 64
    mosaic = (rng.random((h, w)) * 0.8).astype(np.float32)
    data = np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1))))
    proc = ImageProcessor(
        (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12,
        ImageProcessingSettings(debayer=Debayer.bilinear, postprocess=False,
                                enable_denoise=False, enable_bilateral=False,
                                tone_mapping=ToneMapper.filmic, tone_intensity=1.0),
    )
    out = np.asarray(proc.process(jnp.asarray(data), 'x'))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
