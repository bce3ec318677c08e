"""Torch interop layer: torch tensors in, torch tensors out."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import tpu_darktable.torch_compat as tc


def test_functions_accept_torch(rng):
    rgb = torch.rand(16, 16, 3)
    lab = tc.rgb_to_lab(rgb)
    assert isinstance(lab, torch.Tensor)
    back = tc.lab_to_rgb(lab)
    assert torch.allclose(back, rgb, atol=1e-4)


def test_demosaic_roundtrip(rng):
    rgb = torch.rand(32, 32, 3)
    mosaic = tc.rgb_to_bayer(rgb, tc.BayerPattern.RGGB)
    assert isinstance(mosaic, torch.Tensor) and mosaic.shape == (32, 32, 1)
    out = tc.bilinear5x5_demosaic(mosaic, tc.BayerPattern.RGGB)
    assert isinstance(out, torch.Tensor) and out.shape == (32, 32, 3)


def test_workspace_class(rng):
    mosaic = torch.rand(64, 64, 1)
    rcd = tc.RCD(None, (64, 64), tc.BayerPattern.RGGB)
    out = rcd.process(mosaic)
    assert isinstance(out, torch.Tensor) and out.shape == (64, 64, 3)


def test_wiener_torch(rng):
    img = torch.rand(48, 48, 3)
    w = tc.Wiener(None, (48, 48))
    out = w.process(img, 0.0)
    assert isinstance(out, torch.Tensor)
    assert torch.allclose(out, img, atol=1e-4)


def test_jpeg_torch():
    img = (torch.rand(32, 48, 3) * 255).to(torch.uint8)
    data = tc.Jpeg().encode(img, quality=90)
    assert isinstance(data, torch.Tensor) and data.dtype == torch.uint8
