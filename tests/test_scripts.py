"""Scripts layer: CLIs run headless, viewer controller logic works."""

import io
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_darktable as td
from tpu_darktable.ops import packed
from tpu_darktable.pipeline.camera_settings import CameraSettings
from tpu_darktable.pipeline.config import ImageProcessingSettings, Debayer, ToneMapper
from tpu_darktable.scripts.bayer_utils import channel_statistics, extract_bayer_channels


@pytest.fixture(scope='module')
def test_png(tmp_path_factory):
    from PIL import Image

    path = tmp_path_factory.mktemp('imgs') / 'test.png'
    rng = np.random.default_rng(0)
    arr = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


@pytest.fixture(scope='module')
def raw_file(tmp_path_factory):
    """A synthetic packed-12 raw file + matching camera settings."""
    h, w = 64, 96
    rng = np.random.default_rng(1)
    mosaic = (rng.random((h, w)) * 0.8).astype(np.float32)
    data = np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1))))
    d = tmp_path_factory.mktemp('cam') / 'testcam'
    d.mkdir()
    path = d / 'frame0.raw'
    path.write_bytes(data.tobytes())
    settings = CameraSettings(
        name='testcam',
        image_size=(w, h),
        image_processing=ImageProcessingSettings(
            debayer=Debayer.bilinear, postprocess=False, enable_denoise=False,
            enable_bilateral=False, tone_mapping=ToneMapper.reinhard, tone_intensity=2.5,
        ),
    )
    return path, settings


def _run_cli(module, *args):
    return subprocess.run(
        [sys.executable, '-m', module, *args],
        capture_output=True, text=True, timeout=480,
        env={'PATH': '/usr/bin:/bin:/usr/local/bin',
             'JAX_PLATFORMS': 'cpu',
             'HOME': str(Path.home()),
             'MPLBACKEND': 'Agg'},
        cwd=Path(__file__).parent.parent,
    )


def test_dump_camera_settings_cli():
    r = _run_cli('tpu_darktable.scripts.dump_camera_settings', '--camera', 'pfr')
    assert r.returncode == 0, r.stderr
    assert 'pfr' in r.stdout and '4112' in r.stdout


def test_debayer_cli(test_png, tmp_path):
    out = tmp_path / 'cmp.png'
    r = _run_cli('tpu_darktable.scripts.test_debayer', str(test_png),
                 '--algorithm', 'bilinear', '--output', str(out))
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_jpeg_cli(test_png, tmp_path):
    out = tmp_path / 'cmp.png'
    jpg = tmp_path / 'out.jpg'
    r = _run_cli('tpu_darktable.scripts.test_jpeg', str(test_png),
                 '--quality', '90', '--save', str(jpg), '--output', str(out))
    assert r.returncode == 0, r.stderr
    assert 'PSNR' in r.stdout and jpg.exists()


def test_bayer_utils(rng):
    mosaic = rng.random((16, 16)).astype(np.float32)
    chans = extract_bayer_channels(mosaic, td.BayerPattern.RGGB)
    assert sum(v.size for v in chans.values()) == 256
    stats = channel_statistics(mosaic, td.BayerPattern.RGGB)
    assert set(stats) == {'R', 'G1', 'G2', 'B'}


def test_pipeline_controller(raw_file):
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController, widget_spec

    path, settings = raw_file
    c = PipelineController(settings, [path])
    img = c.process_current()
    assert img.shape == (64, 96, 3) and img.dtype == np.uint8

    # live settings update changes output
    c.update_setting('tone_gamma', 2.0)
    img2 = c.process_current()
    assert (img != img2).any()

    # preset switch + rotate + reset
    c.apply_preset('reinhard')
    assert c.settings.tone_mapping == ToneMapper.reinhard
    c.rotate()
    img3 = c.process_current()
    assert img3.shape == (96, 64, 3)
    c.reset()
    assert c.settings == settings.image_processing

    # settings persistence round trip
    import tempfile

    with tempfile.NamedTemporaryFile(suffix='.json', delete=False) as f:
        target = c.save_settings(Path(f.name))
    loaded = CameraSettings.load_json(target)
    assert loaded.image_processing == c.settings

    # widget metadata introspection
    kind, meta = widget_spec('tone_gamma')
    assert kind == 'slider' and meta['range'] == (0.1, 5.0)


def test_histogram_display(raw_file):
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.histogram_display import draw_histograms
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController

    path, settings = raw_file
    c = PipelineController(settings, [path])
    fig, ax = plt.subplots()
    sat = draw_histograms(ax, np.asarray(c.current_bayer()), settings.bayer_pattern)
    assert set(sat) == {'R', 'G1', 'G2', 'B'}
    plt.close(fig)


def test_jpeg_utils_roundtrip(rng):
    from tpu_darktable.scripts.view_raw.jpeg_utils import (
        decode_jpeg_bytes, encode_jpeg_bytes, jpeg_psnr,
    )

    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    img = np.clip(np.stack([
        128 + 90 * np.sin(xx / 7), 128 + 70 * np.cos(yy / 9), 128 + 50 * np.sin((xx + yy) / 11)
    ], -1), 0, 255).astype(np.uint8)
    data = encode_jpeg_bytes(img, quality=90)
    dec = decode_jpeg_bytes(data)
    assert dec.shape == img.shape
    assert jpeg_psnr(img, dec) > 30.0
