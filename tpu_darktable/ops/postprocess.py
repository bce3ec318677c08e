"""Demosaic postprocess: color smoothing + green equilibration.

TPU-native rebuild of csrc/debayer/postprocess.cu.  The reference ping-pongs
two buffers through N median passes and host-syncs on the global green ratio
(postprocess.cu:364-365); here the passes unroll into one XLA program and the
ratio stays on device (a plain reduction), removing the pipeline stall noted
in SURVEY.md section 3.1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bayer import BayerPattern
from ._stencil import Shifter, median9, row_col_iota, site_masks

try:  # fused Pallas cascade (TPU); per-pass XLA path is the fallback
    from ..kernels.color_smooth import color_smooth_diffs as _color_smooth_diffs
except Exception:  # pragma: no cover - pallas unavailable on exotic setups
    _color_smooth_diffs = None

_F32 = jnp.float32


def _median9(values):
    """Median of 9 planes via compare-exchange network (reduction.h:93-144)."""
    return median9(values)


def color_smoothing_pass(rgb):
    """One 3x3 median pass on R-G and B-G differences, G preserved
    (postprocess.cu:24-78).  Zero-fill outside the image."""
    rgb = jnp.asarray(rgb, dtype=_F32)
    ch = jnp.moveaxis(rgb, -1, 0)  # (3, H, W)
    s = Shifter(ch, 1, mode='constant')

    rg = []
    bg = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = s(dy, dx)
            rg.append(v[0] - v[1])
            bg.append(v[2] - v[1])
    r_med = _median9(rg)
    b_med = _median9(bg)

    g = ch[1]
    r = jnp.maximum(r_med + g, 0.0)
    b = jnp.maximum(b_med + g, 0.0)
    out = jnp.stack((r, jnp.maximum(g, 0.0), b), axis=-1)
    return out


def color_smoothing(rgb, n_passes: int, use_pallas: bool | None = None,
                    _pallas_interpret: bool = False):
    """N median passes, fused into one Pallas kernel when available.

    Identical math to n_passes x color_smoothing_pass (the kernel cascades
    the same zero-fill medians in VMEM, one HBM round trip instead of N;
    kernels/color_smooth.py).  `use_pallas` None = auto (TPU backend only).
    """
    rgb = jnp.asarray(rgb, dtype=_F32)
    if n_passes <= 0:
        return rgb
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    use_pallas = use_pallas and _color_smooth_diffs is not None
    if not use_pallas:
        out = rgb
        for _ in range(n_passes):
            out = color_smoothing_pass(out)
        return out

    g_raw = rgb[..., 1]
    diffs = jnp.stack((rgb[..., 0] - g_raw, rgb[..., 2] - g_raw))
    d_out = _color_smooth_diffs(diffs, g_raw, n_passes=n_passes,
                                interpret=_pallas_interpret)
    gc = jnp.maximum(g_raw, 0.0)
    return jnp.stack((d_out[0] + gc, gc, d_out[1] + gc), axis=-1)


def green_eq_global(rgb, pattern: BayerPattern):
    """Global green equilibration: scale G at green1 sites by
    sum(G2)/sum(G1) (postprocess.cu:175-255).

    Green1 = green sites on even rows, green2 = odd rows (y & 1 split,
    postprocess.cu:196-197).  The reference restricts sums to the even-
    cropped image (isinimage, postprocess.cu:194).
    """
    rgb = jnp.asarray(rgb, dtype=_F32)
    h, w = rgb.shape[:2]
    g = rgb[..., 1]
    masks = site_masks(h, w, pattern)
    rows, cols = row_col_iota(h, w)
    inimage = (cols < 2 * (w // 2)) & (rows < 2 * (h // 2))
    g1 = masks['g'] & ((rows & 1) == 0) & inimage
    g2 = masks['g'] & ((rows & 1) == 1) & inimage

    sum1 = jnp.sum(jnp.where(g1, g, 0.0))
    sum2 = jnp.sum(jnp.where(g2, g, 0.0))
    ratio = jnp.where((sum1 > 0.0) & (sum2 > 0.0), sum2 / jnp.maximum(sum1, 1e-30), 1.0)

    is_green1 = masks['g'] & ((rows & 1) == 0)
    new_g = jnp.where(is_green1, g * ratio, g)
    out = jnp.stack((rgb[..., 0], new_g, rgb[..., 2]), axis=-1)
    return jnp.maximum(out, 0.0)


def green_eq_local(rgb, pattern: BayerPattern, threshold: float):
    """Local green equilibration on green2 (odd-row) sites
    (postprocess.cu:84-169).  `threshold` is pre-scaled (caller divides the
    percent knob by 100, postprocess.cu:383)."""
    rgb = jnp.asarray(rgb, dtype=_F32)
    h, w = rgb.shape[:2]
    g = rgb[..., 1]
    s = Shifter(g, 2, mode='constant')

    o1_1, o1_2 = s(-1, -1), s(-1, 1)
    o1_3, o1_4 = s(1, -1), s(1, 1)
    o2_1, o2_2 = s(-2, 0), s(2, 0)
    o2_3, o2_4 = s(0, -2), s(0, 2)

    m1 = (o1_1 + o1_2 + o1_3 + o1_4) / 4.0
    m2 = (o2_1 + o2_2 + o2_3 + o2_4) / 4.0

    c1 = (
        jnp.abs(o1_1 - o1_2) + jnp.abs(o1_1 - o1_3) + jnp.abs(o1_1 - o1_4)
        + jnp.abs(o1_2 - o1_3) + jnp.abs(o1_3 - o1_4) + jnp.abs(o1_2 - o1_4)
    ) / 6.0
    c2 = (
        jnp.abs(o2_1 - o2_2) + jnp.abs(o2_1 - o2_3) + jnp.abs(o2_1 - o2_4)
        + jnp.abs(o2_2 - o2_3) + jnp.abs(o2_3 - o2_4) + jnp.abs(o2_2 - o2_4)
    ) / 6.0

    maximum = 1.0
    ratio_ok = (m2 > 0.0) & (m1 > 0.0) & (m1 / jnp.where(m2 > 0.0, m2, 1.0) < maximum * 2.0)
    apply = (
        ratio_ok
        & (g < maximum * 0.95)
        & (c1 < maximum * threshold)
        & (c2 < maximum * threshold)
    )
    corrected = g * (m1 / jnp.where(m2 > 0.0, m2, 1.0))

    masks = site_masks(h, w, pattern)
    rows, _ = row_col_iota(h, w)
    green2 = masks['g'] & ((rows & 1) == 1)
    new_g = jnp.where(green2 & apply, corrected, g)
    new_g = jnp.maximum(new_g, 0.0)
    return jnp.stack((rgb[..., 0], new_g, rgb[..., 2]), axis=-1)


def postprocess(
    rgb,
    pattern: BayerPattern,
    color_smoothing_passes: int = 0,
    green_eq_local_enabled: bool = False,
    green_eq_global_enabled: bool = False,
    green_eq_threshold: float = 0.04,
):
    """Full postprocess sequence (PostProcessImpl::process,
    postprocess.cu:311-390): N smoothing passes -> global green eq -> local
    green eq."""
    out = jnp.asarray(rgb, dtype=_F32)
    out = color_smoothing(out, color_smoothing_passes)
    if green_eq_global_enabled:
        out = green_eq_global(out, pattern)
    if green_eq_local_enabled:
        out = green_eq_local(out, pattern, green_eq_threshold / 100.0)
    return out


__all__ = [
    'color_smoothing',
    'color_smoothing_pass',
    'green_eq_global',
    'green_eq_local',
    'postprocess',
]
