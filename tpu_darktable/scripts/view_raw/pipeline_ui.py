"""Pipeline controller: settings state + live reprocessing.

Mirror of reference view_raw/pipeline_ui.py:23-269 - owns the camera
settings, the ImageProcessor, the current raw file, and rebuilds the
processed image whenever a setting changes.  Widget ranges come from the
pydantic validators (config.get_validator), the reference's auto-slider
pattern (pipeline_ui.py:175-199).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.pipeline import ImageProcessor
from tpu_darktable.pipeline.camera_settings import CameraSettings, load_raw_bytes
from tpu_darktable.pipeline.config import (
    Bool,
    EnumValidator,
    Float,
    ImageProcessingSettings,
    Int,
    get_validator,
)
from tpu_darktable.pipeline.presets import presets
from tpu_darktable.pipeline.transform import ImageTransform, transform


# Settings fields surfaced as widgets, in display order (the reference
# derives these from the validator metadata; we list the annotated fields).
SLIDER_FIELDS = [
    'tone_gamma',
    'tone_intensity',
    'light_adapt',
    'vibrance',
    'denoise',
    'bilateral',
]
CHECKBOX_FIELDS = ['postprocess', 'enable_denoise', 'enable_bilateral']
RADIO_FIELDS = ['debayer', 'tone_mapping']


def widget_spec(field: str):
    """(kind, metadata) for a settings field, from its validator."""
    v = get_validator(ImageProcessingSettings, field)
    if isinstance(v, Float) or isinstance(v, Int):
        return 'slider', {'range': v.range, 'label': v.description}
    if isinstance(v, Bool):
        return 'checkbox', {'label': v.description}
    if isinstance(v, EnumValidator):
        return 'radio', {'options': [e.name for e in v.enum_type], 'label': v.description}
    return None, {}


class PipelineController:
    """Owns settings + processor; reprocesses on change
    (reference pipeline_ui.py:26-132)."""

    def __init__(self, camera_settings: CameraSettings, raw_files: list[Path], device=None):
        self.camera_settings = camera_settings
        self.raw_files = raw_files
        self.index = 0
        self.settings = camera_settings.image_processing
        self.processor = ImageProcessor.from_camera_settings(camera_settings, device)
        self.extra_rotation = ImageTransform.none
        self._raw_cache: dict[Path, jnp.ndarray] = {}

    @property
    def current_file(self) -> Path:
        return self.raw_files[self.index]

    def load_current(self):
        path = self.current_file
        if path not in self._raw_cache:
            self._raw_cache[path] = load_raw_bytes(path)
        return self._raw_cache[path]

    def current_bayer(self):
        """Decoded (H, W) mosaic for histograms."""
        return self.processor.load_bytes(self.load_current())

    def process_current(self) -> np.ndarray:
        """Full pipeline on the current frame -> uint8 RGB (no EMA: single
        image processing like the viewer, reference pipeline_ui.py:65-74)."""
        rgb = self.processor.load_image(self.load_current())
        bounds = td.compute_image_bounds([rgb], stride=8)
        rgb = self.processor.process_rgb(rgb, bounds)
        metrics = td.compute_image_metrics([rgb], stride=8)
        out = self.processor.tonemap(rgb, metrics)
        name = self.current_file.parent.stem
        out = self.processor.transform(out, name) if isinstance(
            self.processor.transforms, dict) and name in self.processor.transforms else (
            self.processor.transform(out, name) if not isinstance(self.processor.transforms, dict) else out)
        out = transform(out, self.extra_rotation)
        return np.asarray(out)

    def update_setting(self, field: str, value):
        """Immutable settings update + selective rebuild
        (reference pipeline_ui.py:94-99)."""
        cur = getattr(self.settings, field)
        if isinstance(cur, bool):
            value = bool(value)
        elif isinstance(cur, int) and not isinstance(cur, bool):
            value = int(value)
        elif isinstance(cur, float):
            value = float(value)
        self.settings = self.settings.model_copy(update={field: value})
        self.processor.update_settings(self.settings)

    def apply_preset(self, name: str):
        self.settings = presets[name]
        self.processor.update_settings(self.settings)

    def rotate(self):
        self.extra_rotation = self.extra_rotation.next_rotation()

    def next_image(self, step: int = 1):
        self.index = (self.index + step) % len(self.raw_files)

    def reset(self):
        self.settings = self.camera_settings.image_processing
        self.processor.update_settings(self.settings)
        self.extra_rotation = ImageTransform.none

    def save_settings(self, path: Path | None = None):
        """Write live settings back into the camera JSON
        (reference ui.py:194-197)."""
        updated = self.camera_settings.model_copy(update={'image_processing': self.settings})
        target = path or (
            Path(td.__file__).parent / 'camera_settings' / f'{self.camera_settings.name}.json'
        )
        updated.save_json(target)
        return target
