"""Public debayer module - mirrors reference torch_darktable/debayer.py.

Workspace classes (PPG / RCD / PostProcess) keep the reference's
constructor signatures (device, image_size, pattern, ...) for drop-in
compatibility, but are thin wrappers over pure jitted functions - jit shape
specialization replaces the CUDA workspace buffers (SURVEY.md section 7).
`device` is accepted for compatibility and may be None or a jax.Device.
"""

from __future__ import annotations


from ._jit import jit_with_static
from .ops.bayer import BayerPattern, PackedFormat
from .ops import demosaic as _demosaic
from .ops import rcd as _rcd
from .ops import postprocess as _postprocess
from .ops.packed import (
    decode12,
    decode12_float,
    decode12_half,
    decode12_u16,
    encode,
    encode12_float,
    encode12_u16,
)


def bilinear5x5_demosaic(image, bayer_pattern: BayerPattern):
    """5x5 bilinear demosaic of an (H, W, 1) Bayer image -> (H, W, 3)."""
    return jit_with_static(_demosaic.bilinear5x5_demosaic, pattern=bayer_pattern)(image)


class Bilinear5x5:
    """Stateless wrapper (reference debayer.py:10-15)."""

    def __init__(self, bayer_pattern: BayerPattern):
        self.bayer_pattern = bayer_pattern
        self._fn = jit_with_static(_demosaic.bilinear5x5_demosaic, pattern=bayer_pattern)

    def process(self, image):
        return self._fn(image)


class PPG:
    """PPG demosaic workspace (reference debayer.py:18-52)."""

    def __init__(
        self,
        device=None,
        image_size: tuple[int, int] | None = None,
        bayer_pattern: BayerPattern = BayerPattern.RGGB,
        *,
        median_threshold: float = 0.0,
    ):
        device, image_size = _norm_workspace_args(device, image_size)
        self._width, self._height = image_size
        self._pattern = bayer_pattern
        self._median_threshold = float(median_threshold)
        self._fn = jit_with_static(
            _demosaic.ppg_demosaic,
            pattern=bayer_pattern,
            median_threshold=self._median_threshold,
        )

    def process(self, input_tensor):
        expected = (self._height, self._width, 1)
        if tuple(input_tensor.shape) != expected:
            raise RuntimeError(f'PPG input shape {input_tensor.shape} != expected {expected}')
        return self._fn(input_tensor)

    @property
    def image_size(self) -> tuple[int, int]:
        return (self._width, self._height)

    @property
    def median_threshold(self) -> float:
        return self._median_threshold


class RCD:
    """RCD demosaic workspace (reference debayer.py:55-77)."""

    def __init__(
        self,
        device=None,
        image_size: tuple[int, int] | None = None,
        bayer_pattern: BayerPattern = BayerPattern.RGGB,
    ):
        device, image_size = _norm_workspace_args(device, image_size)
        self._width, self._height = image_size
        self._pattern = bayer_pattern
        self._fn = jit_with_static(_rcd.rcd_demosaic, pattern=bayer_pattern)

    def process(self, input_tensor):
        expected = (self._height, self._width, 1)
        if tuple(input_tensor.shape) != expected:
            raise RuntimeError(f'RCD input shape {input_tensor.shape} != expected {expected}')
        return self._fn(input_tensor)

    @property
    def image_size(self) -> tuple[int, int]:
        return (self._width, self._height)


class PostProcess:
    """Color-smoothing / green-eq workspace (reference debayer.py:80-131)."""

    def __init__(
        self,
        device=None,
        image_size: tuple[int, int] | None = None,
        bayer_pattern: BayerPattern = BayerPattern.RGGB,
        *,
        color_smoothing_passes: int = 0,
        green_eq_local: bool = False,
        green_eq_global: bool = False,
        green_eq_threshold: float = 0.04,
    ):
        device, image_size = _norm_workspace_args(device, image_size)
        self._width, self._height = image_size
        self._color_smoothing_passes = int(color_smoothing_passes)
        self._green_eq_threshold = float(green_eq_threshold)
        self._fn = jit_with_static(
            _postprocess.postprocess,
            pattern=bayer_pattern,
            color_smoothing_passes=int(color_smoothing_passes),
            green_eq_local_enabled=bool(green_eq_local),
            green_eq_global_enabled=bool(green_eq_global),
            green_eq_threshold=float(green_eq_threshold),
        )

    def process(self, input_tensor):
        expected = (self._height, self._width, 3)
        if tuple(input_tensor.shape) != expected:
            raise RuntimeError(
                f'PostProcess input shape {input_tensor.shape} != expected {expected}'
            )
        return self._fn(input_tensor)

    @property
    def image_size(self) -> tuple[int, int]:
        return (self._width, self._height)

    @property
    def color_smoothing_passes(self) -> int:
        return self._color_smoothing_passes

    @property
    def green_eq_threshold(self) -> float:
        return self._green_eq_threshold


def _norm_workspace_args(device, image_size):
    """Accept both reference-style (device, image_size, ...) and the shorter
    (image_size, ...) call patterns."""
    if image_size is None and isinstance(device, (tuple, list)):
        return None, tuple(device)
    if image_size is None:
        raise TypeError('image_size is required')
    return device, tuple(image_size)


__all__ = [
    'PPG',
    'RCD',
    'BayerPattern',
    'Bilinear5x5',
    'PackedFormat',
    'PostProcess',
    'bilinear5x5_demosaic',
    'decode12',
    'decode12_float',
    'decode12_half',
    'decode12_u16',
    'encode',
    'encode12_float',
    'encode12_u16',
]
