"""Pipeline layer: typed config, camera registry, and the fused processor."""

from .config import Debayer, ImageProcessingSettings, ToneMapper
from .camera_settings import CameraSettings
from .image_processor import ImageProcessor, ImageSizeMismatchError
from .presets import get_preset, presets
from .transform import ImageTransform, transform, transformed_size

__all__ = [
    'CameraSettings',
    'Debayer',
    'ImageProcessingSettings',
    'ImageProcessor',
    'ImageSizeMismatchError',
    'ImageTransform',
    'ToneMapper',
    'get_preset',
    'presets',
    'transform',
    'transformed_size',
]
