"""Main viewer window: image display + generated settings widgets.

Mirror of reference view_raw/ui.py:65-282 + ui_builder.py - a matplotlib
window whose sliders / checkboxes / radio buttons are generated from the
pydantic validator metadata and reprocess the frame on every change.
Keyboard: left/right = navigate, r = rotate, s = save JPEG, w = write
settings, 0 = reset, h = histogram window, j = JPEG preview window.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .pipeline_ui import (
    CHECKBOX_FIELDS,
    SLIDER_FIELDS,
    PipelineController,
    widget_spec,
)
from .histogram_display import draw_histograms
from .jpeg_utils import decode_jpeg_bytes, encode_jpeg_bytes, jpeg_psnr


class ProcessRawUI:
    """Interactive viewer (reference ui.py:65-282)."""

    def __init__(self, controller: PipelineController):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, CheckButtons, RadioButtons, Slider

        self.c = controller
        self.plt = plt

        self.fig = plt.figure(figsize=(14, 9))
        self.fig.canvas.manager.set_window_title('tpu-darktable raw viewer')
        self.ax_img = self.fig.add_axes([0.02, 0.05, 0.64, 0.9])
        self.ax_img.axis('off')

        x0, w = 0.70, 0.26
        y = 0.92
        self.sliders = {}
        for field in SLIDER_FIELDS:
            kind, meta = widget_spec(field)
            if kind != 'slider':
                continue
            ax = self.fig.add_axes([x0 + 0.05, y, w - 0.05, 0.025])
            lo, hi = meta['range']
            s = Slider(ax, meta['label'], lo, hi,
                       valinit=getattr(self.c.settings, field))
            s.on_changed(self._make_slider_cb(field))
            self.sliders[field] = s
            y -= 0.045

        ax = self.fig.add_axes([x0, y - 0.11, w / 2, 0.12])
        labels = CHECKBOX_FIELDS
        actives = [bool(getattr(self.c.settings, f)) for f in labels]
        self.checks = CheckButtons(ax, labels, actives)
        self.checks.on_clicked(self._on_check)

        ax = self.fig.add_axes([x0 + w / 2, y - 0.11, w / 2, 0.12])
        from tpu_darktable.pipeline.config import Debayer

        self.radio_debayer = RadioButtons(ax, [d.name for d in Debayer],
                                          active=list(Debayer).index(self.c.settings.debayer))
        self.radio_debayer.on_clicked(self._on_debayer)
        y -= 0.16

        ax = self.fig.add_axes([x0, y - 0.11, w / 2, 0.12])
        from tpu_darktable.pipeline.config import ToneMapper

        self.radio_tm = RadioButtons(ax, [t.name for t in ToneMapper],
                                     active=list(ToneMapper).index(self.c.settings.tone_mapping))
        self.radio_tm.on_clicked(self._on_tonemap)

        ax = self.fig.add_axes([x0 + w / 2, y - 0.11, w / 2, 0.12])
        from tpu_darktable.pipeline.presets import presets

        self.radio_preset = RadioButtons(ax, list(presets.keys()))
        self.radio_preset.on_clicked(self._on_preset)
        y -= 0.16

        self.buttons = {}
        for i, (label, cb) in enumerate([
            ('prev', lambda e: self._nav(-1)),
            ('next', lambda e: self._nav(1)),
            ('rotate', lambda e: self._rotate()),
            ('save jpg', lambda e: self._save_jpeg()),
            ('save cfg', lambda e: self._save_settings()),
            ('reset', lambda e: self._reset()),
        ]):
            ax = self.fig.add_axes([x0 + (i % 3) * w / 3, y - 0.05 * (i // 3 + 1), w / 3, 0.04])
            b = Button(ax, label)
            b.on_clicked(cb)
            self.buttons[label] = b

        self.fig.canvas.mpl_connect('key_press_event', self._on_key)
        self._im = None
        self.refresh()

    # -- callbacks ---------------------------------------------------------
    def _make_slider_cb(self, field):
        def cb(val):
            self.c.update_setting(field, val)
            self.refresh()

        return cb

    def _on_check(self, label):
        self.c.update_setting(label, not getattr(self.c.settings, label))
        self.refresh()

    def _on_debayer(self, label):
        from tpu_darktable.pipeline.config import Debayer

        self.c.update_setting('debayer', Debayer[label])
        self.refresh()

    def _on_tonemap(self, label):
        from tpu_darktable.pipeline.config import ToneMapper

        self.c.update_setting('tone_mapping', ToneMapper[label])
        self.refresh()

    def _on_preset(self, label):
        self.c.apply_preset(label)
        for field, s in self.sliders.items():
            s.set_val(getattr(self.c.settings, field))
        self.refresh()

    def _nav(self, step):
        self.c.next_image(step)
        self.refresh()

    def _rotate(self):
        self.c.rotate()
        self.refresh()

    def _save_jpeg(self):
        img = self.c.process_current()
        out = self.c.current_file.with_suffix('.jpg')
        Path(out).write_bytes(encode_jpeg_bytes(img, quality=94))
        print(f'saved {out}')

    def _save_settings(self):
        target = self.c.save_settings()
        print(f'saved settings to {target}')

    def _reset(self):
        self.c.reset()
        for field, s in self.sliders.items():
            s.set_val(getattr(self.c.settings, field))
        self.refresh()

    def _on_key(self, event):
        if event.key == 'left':
            self._nav(-1)
        elif event.key == 'right':
            self._nav(1)
        elif event.key == 'r':
            self._rotate()
        elif event.key == 's':
            self._save_jpeg()
        elif event.key == 'w':
            self._save_settings()
        elif event.key == '0':
            self._reset()
        elif event.key == 'h':
            self.show_histogram()
        elif event.key == 'j':
            self.show_jpeg_preview()

    # -- windows -----------------------------------------------------------
    def refresh(self):
        img = self.c.process_current()
        if self._im is None or self._im.get_array().shape != img.shape:
            self.ax_img.clear()
            self.ax_img.axis('off')
            self._im = self.ax_img.imshow(img)
        else:
            self._im.set_data(img)
        self.ax_img.set_title(
            f'{self.c.current_file.name}  [{self.c.index + 1}/{len(self.c.raw_files)}]'
        )
        self.fig.canvas.draw_idle()

    def show_histogram(self):
        """Bayer-channel histogram popup (reference histogram_window.py)."""
        fig, ax = self.plt.subplots(figsize=(8, 5))
        bayer = np.asarray(self.c.current_bayer())
        draw_histograms(ax, bayer, self.c.camera_settings.bayer_pattern)
        fig.show()

    def show_jpeg_preview(self):
        """Quality explorer with PSNR + size readout
        (reference jpeg_preview_window.py:10-31)."""
        from matplotlib.widgets import Slider

        img = self.c.process_current()
        fig = self.plt.figure(figsize=(9, 7))
        ax_img = fig.add_axes([0.05, 0.15, 0.9, 0.8])
        ax_img.axis('off')
        ax_q = fig.add_axes([0.15, 0.05, 0.7, 0.03])
        slider = Slider(ax_q, 'quality', 10, 100, valinit=94, valstep=1)
        im = ax_img.imshow(img)

        def update(q):
            data = encode_jpeg_bytes(img, quality=int(q))
            decoded = decode_jpeg_bytes(data)
            im.set_data(decoded)
            ax_img.set_title(
                f'Q{int(q)}: {len(data) / 1024:.0f} KiB, '
                f'PSNR {jpeg_psnr(img, decoded):.1f} dB'
            )
            fig.canvas.draw_idle()

        slider.on_changed(update)
        update(94)
        fig.show()

    def run(self):
        self.plt.show()
