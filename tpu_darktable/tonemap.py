"""Public tonemap module - mirrors reference torch_darktable/tonemap.py."""

from .ops.tonemap import (
    TonemapParameters,
    filmic_tonemap,
    aces_tonemap,
    adaptive_aces_tonemap,
    compute_image_bounds,
    compute_image_metrics,
    linear_tonemap,
    metrics_from_dict,
    metrics_to_dict,
    print_metrics,
    reinhard_tonemap,
)

__all__ = [
    'TonemapParameters',
    'filmic_tonemap',
    'aces_tonemap',
    'adaptive_aces_tonemap',
    'compute_image_bounds',
    'compute_image_metrics',
    'linear_tonemap',
    'metrics_from_dict',
    'metrics_to_dict',
    'print_metrics',
    'reinhard_tonemap',
]
