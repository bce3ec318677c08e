"""Tone mapping (linear / Reinhard / ACES / adaptive ACES) and image statistics.

TPU-native rebuild of csrc/tonemap/ (tonemap.h, color_adaption.{h,cu},
reinhard.cu, linear.cu, aces.cu).  The statistics kernels' cooperative-group
reductions + atomics become plain jnp reductions; the per-pixel tonemap
kernels become fused pointwise jnp maps ending in uint8.  Everything is
batch-polymorphic over leading axes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .color import modify_vibrance, rgb_to_gray
from .._validate import check_channels_last


@dataclass(frozen=True)
class TonemapParameters:
    """Mirror of the reference TonemapParams struct (tonemap/tonemap.h:6-15)
    and its Python dataclass (tonemap.py:11-37)."""

    gamma: float = 1.0
    intensity: float = 0.0
    light_adapt: float = 0.8
    vibrance: float = 0.0


def _as_batch(images):
    """list of (H, W, 3) or (..., H, W, 3) array -> (B, H, W, 3)."""
    if isinstance(images, (list, tuple)):
        arr = jnp.stack([
            check_channels_last(jnp.asarray(im), 'images[i]') for im in images
        ])
    else:
        arr = check_channels_last(jnp.asarray(images), 'images')
    if arr.ndim == 3:
        arr = arr[None]
    elif arr.ndim < 3:
        raise RuntimeError(
            f'images must be (H, W, 3) or batched, got shape {tuple(arr.shape)}'
        )
    return arr.reshape((-1,) + arr.shape[-3:])


def compute_image_bounds(images, stride: int = 8):
    """Global [min, max] over strided pixels of an image set
    (color_adaption.cu:12-36, :90-120).

    Returns a (2,) float32 array.
    """
    batch = _as_batch(images)
    # Two sequential 1-D strided slices: a fused 2-D strided slice costs
    # ~3 ms extra at 12MP on TPU (pathological gather-like lowering).
    sampled = batch[:, ::stride][:, :, ::stride]
    return jnp.stack((jnp.min(sampled), jnp.max(sampled))).astype(jnp.float32)


def compute_image_metrics(images, stride: int = 8, min_gray: float = 1e-4, rescale: bool = False):
    """5-vector [log_mean, linear_mean, rgb_mean r, g, b] over strided,
    saturation-masked pixels (color_adaption.cu:39-84, :122-166).

    Saturation mask: any channel of the bounds-rescaled pixel >= 0.99.
    Normalized by the valid-pixel count - computed in-graph (the reference
    host-syncs on valid_count.item(); here it stays on device).
    """
    batch = _as_batch(images)
    sampled = batch[:, ::stride][:, :, ::stride].astype(jnp.float32)

    if rescale:
        bounds = compute_image_bounds(images, stride)
        b0, b1 = bounds[0], bounds[1]
    else:
        b0, b1 = jnp.float32(0.0), jnp.float32(1.0)

    eps = jnp.float32(1e-6)
    scaled = (sampled - b0) / (b1 - b0 + eps)
    saturated = jnp.any(scaled >= 0.99, axis=-1)
    mask = jnp.where(saturated, 0.0, 1.0)

    gray = rgb_to_gray(scaled)
    log_gray = jnp.log(jnp.maximum(gray, min_gray))

    sums = jnp.stack(
        (
            jnp.sum(log_gray * mask),
            jnp.sum(gray * mask),
            jnp.sum(scaled[..., 0] * mask),
            jnp.sum(scaled[..., 1] * mask),
            jnp.sum(scaled[..., 2] * mask),
        )
    )
    valid = jnp.maximum(jnp.sum(mask), 1.0)
    return (sums / valid).astype(jnp.float32)


def _compute_map_key(log_mean):
    """log_mean -> tone map key in [0.3, 1.0] (color_adaption.h:17-29)."""
    log_range = 9.21034  # -log(1e-4)
    gamma = 1.4
    normalized = jnp.clip((-log_mean) / log_range, 0.0, 1.0)
    powered = jnp.power(normalized, gamma)
    return 0.3 + 0.7 * powered


def _compute_adaptation(metrics, pixel_rgb, light_adapt, intensity):
    """Per-pixel adaptation value (color_adaption.h:32-76)."""
    metrics = jnp.asarray(metrics, dtype=jnp.float32)
    map_key = _compute_map_key(metrics[0])
    global_mean = metrics[2:5]
    exposure = jnp.exp(jnp.float32(intensity))
    adapt_mean = global_mean + light_adapt * (pixel_rgb - global_mean)
    return jnp.power(adapt_mean / exposure, map_key)


def _to_uint8(x):
    """float [0,1]-ish -> uint8 via round(x*255) clamped (device_math.h:347-349)."""
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


def _finish(tonemapped, gamma, vibrance):
    """Shared gamma + vibrance + uint8 tail of every tonemap kernel."""
    gamma_corrected = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / gamma)
    with_vibrance = modify_vibrance(gamma_corrected, vibrance)
    return _to_uint8(with_vibrance)


def reinhard_tonemap(image, metrics, params: TonemapParameters):
    """Adaptive Reinhard rgb/(adapt+rgb) (tonemap/reinhard.cu:17-45)."""
    rgb = check_channels_last(jnp.asarray(image, dtype=jnp.float32), 'image')
    adapt = _compute_adaptation(metrics, rgb, params.light_adapt, params.intensity)
    tonemapped = rgb / (adapt + rgb)
    return _finish(tonemapped, params.gamma, params.vibrance)


def linear_tonemap(image, metrics, params: TonemapParameters):
    """Adaptive linear rgb/adapt with clamp (tonemap/linear.cu:13-40)."""
    rgb = check_channels_last(jnp.asarray(image, dtype=jnp.float32), 'image')
    adapt = _compute_adaptation(metrics, rgb, params.light_adapt, params.intensity)
    tonemapped = rgb / adapt
    gamma_corrected = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / params.gamma)
    with_vibrance = modify_vibrance(gamma_corrected, params.vibrance)
    return _to_uint8(jnp.clip(with_vibrance, 0.0, 1.0))


# ACES fitted RRT+ODT (tonemap/aces.cu:13-34)
_ACES_INPUT = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=np.float32,
)

_ACES_OUTPUT = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=np.float32,
)


def _rrt_and_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def _aces_curve(rgb):
    from .color import color_transform_3x3

    aces_in = color_transform_3x3(rgb, _ACES_INPUT)
    compressed = _rrt_and_odt_fit(aces_in)
    return color_transform_3x3(compressed, _ACES_OUTPUT)


def aces_tonemap(image, params: TonemapParameters, metrics=None):
    """ACES tonemap; plain (exposure = 2^intensity, aces.cu:67-89) or adaptive
    when metrics given (aces.cu:37-63).  Matches reference tonemap.py:110-131
    dispatch."""
    rgb = check_channels_last(jnp.asarray(image, dtype=jnp.float32), 'image')
    if metrics is None:
        tonemapped = _aces_curve(rgb * jnp.power(jnp.float32(2.0), jnp.float32(params.intensity)))
    else:
        adjustment = _compute_adaptation(metrics, rgb, params.light_adapt, params.intensity)
        tonemapped = _aces_curve(rgb / adjustment)
    return _finish(tonemapped, params.gamma, params.vibrance)


def adaptive_aces_tonemap(image, metrics, params: TonemapParameters):
    """Explicit adaptive ACES entry point (aces.cu:143-176)."""
    return aces_tonemap(image, params, metrics)


def _filmic_curve(x):
    """Hable (Uncharted 2) filmic operator, white-point normalized."""
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30

    def hable(v):
        return ((v * (a * v + c * b) + d * e) / (v * (a * v + b) + d * f)) - e / f

    white = 11.2
    return hable(x) / hable(jnp.float32(white))


def filmic_tonemap(image, params: TonemapParameters, metrics=None):
    """Filmic tonemap (Hable curve): plain with exposure = 2^intensity, or
    adaptive when metrics are given.  A new capability beyond the reference
    (BASELINE.json config 4 names Reinhard/filmic/ACES curves)."""
    rgb = check_channels_last(jnp.asarray(image, dtype=jnp.float32), 'image')
    if metrics is None:
        tonemapped = _filmic_curve(rgb * jnp.power(jnp.float32(2.0), jnp.float32(params.intensity)))
    else:
        adjustment = _compute_adaptation(metrics, rgb, params.light_adapt, params.intensity)
        tonemapped = _filmic_curve(rgb / adjustment)
    return _finish(tonemapped, params.gamma, params.vibrance)


def metrics_to_dict(metrics):
    """5-element metrics -> named dict (reference tonemap.py:41-52)."""
    m = np.asarray(metrics)
    assert m.size == 5, f'Expected 5 elements, got {m.size}'
    m = m.reshape(-1)
    return {
        'log_mean': float(m[0]),
        'linear_mean': float(m[1]),
        'rgb_mean': (float(m[2]), float(m[3]), float(m[4])),
    }


def metrics_from_dict(metrics_dict):
    """Named dict -> 5-element metrics (reference tonemap.py:55-72)."""
    rgb_mean = metrics_dict['rgb_mean']
    return jnp.asarray(
        [
            metrics_dict['log_mean'],
            metrics_dict['linear_mean'],
            rgb_mean[0],
            rgb_mean[1],
            rgb_mean[2],
        ],
        dtype=jnp.float32,
    )


def print_metrics(metrics):
    """Pretty-print metrics (reference tonemap.py:75-83)."""
    d = metrics_to_dict(metrics)
    rgb = d['rgb_mean']
    print('Image Metrics:')
    print(f'  Log Mean: {d["log_mean"]:.4f}')
    print(f'  Linear Mean: {d["linear_mean"]:.4f}')
    print(f'  RGB Mean: ({rgb[0]:.4f}, {rgb[1]:.4f}, {rgb[2]:.4f})')


__all__ = [
    'TonemapParameters',
    'aces_tonemap',
    'adaptive_aces_tonemap',
    'compute_image_bounds',
    'filmic_tonemap',
    'compute_image_metrics',
    'linear_tonemap',
    'metrics_from_dict',
    'metrics_to_dict',
    'print_metrics',
    'reinhard_tonemap',
]
