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


def test_histogram_window(raw_file):
    """Persistent levels popup: channel toggles + saturation legend +
    update_display on a new frame (reference histogram_window.py parity)."""
    import matplotlib

    matplotlib.use('Agg')

    from tpu_darktable.scripts.view_raw.histogram_window import HistogramWindow
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController

    path, settings = raw_file
    c = PipelineController(settings, [path])
    bayer = np.asarray(c.current_bayer())

    win = HistogramWindow(bayer, settings.bayer_pattern)
    assert win.is_open()
    assert 'μ=' in win.hist_ax.get_title()
    legend = win.hist_ax.get_legend()
    assert legend is not None
    assert any('% sat' in t.get_text() for t in legend.get_texts())

    # toggle a channel off: legend loses that entry
    win._on_channel_toggle('Red')
    assert not win.channel_states['Red']
    texts = [t.get_text() for t in win.hist_ax.get_legend().get_texts()]
    assert not any(t.startswith('Red') for t in texts)

    # refresh with a new frame keeps working
    win.update_display(bayer * 0.5)
    win.close()
    assert not win.is_open()


def test_jpeg_preview_window(raw_file):
    """Persistent JPEG explorer: quality changes re-encode, PSNR/size
    readout updates (reference jpeg_preview_window.py:10-31 parity)."""
    import matplotlib

    matplotlib.use('Agg')

    from tpu_darktable.scripts.view_raw.jpeg_preview_window import JpegPreviewWindow
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController

    path, settings = raw_file
    c = PipelineController(settings, [path])

    win = JpegPreviewWindow(c.process_current)
    assert win.is_open()
    first = win.info_text.get_text()
    assert 'dB PSNR' in first and 'MB' in first

    win.quality_slider.set_val(30)
    assert win.jpeg_quality == 30
    assert win.info_text.get_text() != first  # lower quality -> new readout

    win._on_progressive_toggle('Progressive')
    assert win.jpeg_progressive
    win.close()
    assert not win.is_open()


def test_histogram_ui_component(raw_file):
    """Embedded HistogramDisplay: mode switching preserves zoom scale."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.histogram_ui import HistogramDisplay
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController

    path, settings = raw_file
    c = PipelineController(settings, [path])
    bayer = np.asarray(c.current_bayer())

    fig = plt.figure()
    disp = HistogramDisplay()
    res = disp.setup_display(fig, (0.1, 0.1, 0.8, 0.8), bayer, settings.bayer_pattern)
    assert 'μ=' in res.display_info and not res.needs_setup
    assert disp.get_channel_controls() is not None

    res = disp.update_display(bayer, settings.bayer_pattern, channel_mode='Red')
    assert disp.channel_mode == 'Red' and not res.needs_setup

    fresh = HistogramDisplay()
    assert fresh.update_display(bayer, settings.bayer_pattern).needs_setup
    plt.close(fig)


def test_histogram_mode_renderer_reference_semantics(raw_file):
    """draw_mode_histograms (reference create_histograms:18-63): full (0,1)
    range including saturated samples, per-mode titles, green halved only
    in 'all' mode."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.histogram_display import (
        draw_mode_histograms)
    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController

    path, settings = raw_file
    c = PipelineController(settings, [path])
    bayer = np.asarray(c.current_bayer())

    fig, ax = plt.subplots()
    draw_mode_histograms(ax, bayer, settings.bayer_pattern, 'all')
    assert ax.get_title() == 'RGB Channels'
    assert ax.get_ylabel() == 'Count (Normalized)'
    # Full range: the last bin edge reaches 1.0 (saturated samples stay in).
    assert max(p.get_x() + p.get_width() for p in ax.patches) >= 1.0 - 1e-9

    ax.clear()
    draw_mode_histograms(ax, bayer, settings.bayer_pattern, 'green')
    assert ax.get_title() == 'Green Channel'
    assert ax.get_ylabel() == 'Count'  # lone green view shows raw counts
    n_green_pixels = bayer.size // 2
    assert sum(p.get_height() for p in ax.patches) == n_green_pixels
    plt.close(fig)


def test_horizontal_radio_layout():
    """orientation='horizontal': labels flow left-to-right on <= 2 rows,
    markers repositioned beside each label (reference ui_builder.py
    horizontal panel style)."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.ui_builder import (
        create_clean_axes, create_radio_buttons)

    fig = plt.figure(figsize=(8, 6))
    ax = create_clean_axes(fig, (0.1, 0.8, 0.8, 0.1))
    rb = create_radio_buttons(ax, ['All', 'Red', 'Green', 'Blue'], 'All',
                              orientation='horizontal')
    pos = [t.get_position() for t in rb.labels]
    ys = sorted({round(y, 3) for _, y in pos})
    assert len(ys) <= 2
    for y in ys:  # x strictly increases within each row
        xs = [x for x, py in pos if round(py, 3) == y]
        assert xs == sorted(xs) and len(set(xs)) == len(xs)

    # A long label set must wrap to two rows rather than overflow.
    ax2 = create_clean_axes(fig, (0.1, 0.6, 0.3, 0.1))
    labels = ['linear', 'reinhard', 'aces', 'adaptive_aces', 'filmic']
    rb2 = create_radio_buttons(ax2, labels, 'aces', orientation='horizontal')
    ys2 = {round(t.get_position()[1], 3) for t in rb2.labels}
    assert len(ys2) == 2
    plt.close(fig)


def test_ui_builder_layout():
    """VStack placement: rows advance downward, half panels pair up."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.ui_builder import (
        VStack, create_checkboxes, create_radio_buttons, fit_fontsize,
    )

    fig = plt.figure(figsize=(10, 8))
    col = VStack(fig, x=0.7, top=0.95, width=0.26)
    s1 = col.slider_ax()
    s2 = col.slider_ax()
    assert s2.get_position().y0 < s1.get_position().y0

    left = col.panel_ax(3, half=1)
    right = col.panel_ax(5, half=2)
    assert abs(left.get_position().x0 - 0.7) < 1e-6
    assert right.get_position().x0 > left.get_position().x0
    after = col.take(0.03)
    # the next row clears the taller (right) panel
    assert after[1] + after[3] <= right.get_position().y0 + 1e-9

    rb = create_radio_buttons(left, ['alpha', 'beta'], 'beta')
    assert rb.value_selected == 'beta'
    cb = create_checkboxes(right, ['one', 'two'], [True, False])
    assert cb.get_status() == [True, False]
    assert fit_fontsize(fig, ['short'], avail_fraction=0.5) == 8.0
    plt.close(fig)


def test_main_ui_constructs_and_refreshes(raw_file):
    """The full ProcessRawUI builds headless, navigates, and keeps its
    popups in sync with the current frame."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from tpu_darktable.scripts.view_raw.pipeline_ui import PipelineController
    from tpu_darktable.scripts.view_raw.ui import ProcessRawUI

    path, settings = raw_file
    c = PipelineController(settings, [path])
    ui = ProcessRawUI(c)
    assert ui._im is not None

    ui.show_histogram()
    ui.show_jpeg_preview()
    assert ui.histogram_window.is_open()
    assert ui.jpeg_window.is_open()

    before = ui.jpeg_window.info_text.get_text()
    ui._nav(1)  # single file: wraps to itself, but must refresh popups
    assert ui.histogram_window.is_open()
    assert 'dB PSNR' in ui.jpeg_window.info_text.get_text()
    assert before == ui.jpeg_window.info_text.get_text()  # same frame

    ui.histogram_window.close()
    ui.jpeg_window.close()
    plt.close(ui.fig)


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
