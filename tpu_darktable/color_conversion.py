"""Public color conversion module - mirrors reference color_conversion.py.

All functions are jax.numpy maps over a trailing channel axis; see
ops/color.py for the implementations and reference citations.
"""

from .ops.color import (
    color_transform_3x3,
    compute_log_luminance,
    compute_luminance,
    hsl_to_rgb,
    lab_to_rgb,
    lab_to_xyz,
    linear_to_srgb,
    modify_hsl,
    modify_log_luminance,
    modify_luminance,
    modify_vibrance,
    rgb_to_hsl,
    rgb_to_lab,
    rgb_to_xyz,
    srgb_to_linear,
    xyz_to_lab,
    xyz_to_linear_rgb,
    xyz_to_rgb,
)

__all__ = [
    'color_transform_3x3',
    'compute_log_luminance',
    'compute_luminance',
    'hsl_to_rgb',
    'lab_to_rgb',
    'lab_to_xyz',
    'linear_to_srgb',
    'modify_hsl',
    'modify_log_luminance',
    'modify_luminance',
    'modify_vibrance',
    'rgb_to_hsl',
    'rgb_to_lab',
    'rgb_to_xyz',
    'srgb_to_linear',
    'xyz_to_lab',
    'xyz_to_linear_rgb',
    'xyz_to_rgb',
]
