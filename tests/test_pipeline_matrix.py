"""Fused-pipeline robustness matrix: patterns x demosaicers x formats.

The reference is only ever exercised on RGGB Packed12 rigs; this sweeps the
full configuration space on awkward (non-multiple-of-8) geometry to pin
shape handling, CFA indexing, and codec selection in the fused program
(build_pipeline_fn statics: image_processor.py here; reference flow
pipeline/image_processor.py:284-300).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_darktable as td
from tpu_darktable.ops import packed
from tpu_darktable.pipeline import ImageProcessor
from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper

H, W = 98, 132  # even (codec/CFA requirement) but not multiples of 8


def _proc(pattern, fmt, debayer, **kw):
    base = dict(
        debayer=debayer, postprocess=True, enable_denoise=True,
        enable_bilateral=True, tone_mapping=ToneMapper.reinhard,
        tone_intensity=2.5,
    )
    base.update(kw)
    return ImageProcessor((W, H), pattern, fmt, ImageProcessingSettings(**base),
                          white_balance=(1.2, 1.0, 1.1))


def _bytes(rng, fmt):
    mosaic = (rng.random(H * W) * 0.8).astype(np.float32)
    return jnp.asarray(np.asarray(packed.encode12_float(
        jnp.asarray(mosaic), ids_format=fmt is td.PackedFormat.Packed12_IDS)))


@pytest.mark.parametrize('pattern', list(td.BayerPattern))
@pytest.mark.parametrize('debayer', [Debayer.rcd, Debayer.ppg, Debayer.bilinear])
def test_all_patterns_and_demosaicers(rng, pattern, debayer):
    proc = _proc(pattern, td.PackedFormat.Packed12, debayer)
    out = np.asarray(proc.process(_bytes(rng, td.PackedFormat.Packed12), 'x'))
    assert out.shape == (H, W, 3) and out.dtype == np.uint8
    assert out.std() > 0  # non-degenerate
    assert np.isfinite(np.asarray(proc.bounds)).all()
    assert np.isfinite(np.asarray(proc.metrics)).all()


@pytest.mark.parametrize('fmt', [td.PackedFormat.Packed12, td.PackedFormat.Packed12_IDS])
def test_both_packed_formats(rng, fmt):
    proc = _proc(td.BayerPattern.GRBG, fmt, Debayer.rcd)
    out = np.asarray(proc.process(_bytes(rng, fmt), 'x'))
    assert out.shape == (H, W, 3) and out.dtype == np.uint8


def test_format_mismatch_decodes_differently(rng):
    """Feeding IDS bytes to a standard-format processor must not error but
    yields different pixels (codec selection is a compile-time static)."""
    data = _bytes(rng, td.PackedFormat.Packed12_IDS)
    p_std = _proc(td.BayerPattern.RGGB, td.PackedFormat.Packed12, Debayer.bilinear,
                  enable_denoise=False, enable_bilateral=False, postprocess=False)
    p_ids = _proc(td.BayerPattern.RGGB, td.PackedFormat.Packed12_IDS, Debayer.bilinear,
                  enable_denoise=False, enable_bilateral=False, postprocess=False)
    a = np.asarray(p_std.process(data, 'x'))
    b = np.asarray(p_ids.process(data, 'x'))
    assert (a != b).any()
