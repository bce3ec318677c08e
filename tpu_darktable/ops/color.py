"""Color space conversions, luminance extraction/modification, HSL and vibrance.

TPU-native rebuild of the reference's color math
(csrc/device_color_conversions.h:7-213, csrc/color_conversions.cu).  Every
function is a pure jax.numpy map over a trailing channel axis, shape
(..., 3) -> (..., 3) or (..., 3) -> (...), so it vectorizes over single
images, batches, and sharded batches identically and fuses into neighbouring
pipeline stages under jit.  All constants match the reference float32 values.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .._validate import check_channels_last

# D65 sRGB <-> XYZ matrices (csrc/device_color_conversions.h:26-30, :88-92)
_RGB_TO_XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    dtype=np.float32,
)

_XYZ_TO_RGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    dtype=np.float32,
)

_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


def linear_to_srgb(linear):
    """sRGB gamma encode (csrc/device_color_conversions.h:7-13)."""
    linear = jnp.asarray(linear)
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-38), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(srgb):
    """sRGB gamma decode (csrc/device_color_conversions.h:15-21)."""
    srgb = jnp.asarray(srgb)
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 1e-38), 2.4),
    )


def color_transform_3x3(color, matrix):
    """Apply a 3x3 matrix over the trailing channel axis (color_conversions.cu:154-162).

    Unrolled multiply-adds rather than a matmul: a K=3 contraction on the MXU
    would round operands to bfloat16 (breaking float32 parity) and is slower
    than fused VPU elementwise code anyway.
    """
    color = check_channels_last(jnp.asarray(color), 'color')
    m = jnp.asarray(matrix, dtype=color.dtype)
    if tuple(m.shape) != (3, 3):
        raise RuntimeError(f'matrix must have shape (3, 3), got {tuple(m.shape)}')
    c0, c1, c2 = color[..., 0], color[..., 1], color[..., 2]
    return jnp.stack(
        (
            m[0, 0] * c0 + m[0, 1] * c1 + m[0, 2] * c2,
            m[1, 0] * c0 + m[1, 1] * c1 + m[1, 2] * c2,
            m[2, 0] * c0 + m[2, 1] * c1 + m[2, 2] * c2,
        ),
        axis=-1,
    )


def rgb_to_xyz(rgb):
    """sRGB (gamma) -> XYZ, includes linearization (device_color_conversions.h:23-33)."""
    return color_transform_3x3(srgb_to_linear(rgb), _RGB_TO_XYZ)


def xyz_to_rgb(xyz):
    """XYZ -> sRGB (gamma), includes gamma encode (device_color_conversions.h:97-106)."""
    return linear_to_srgb(color_transform_3x3(xyz, _XYZ_TO_RGB))


def xyz_to_linear_rgb(xyz):
    """XYZ -> linear RGB (device_color_conversions.h:108-116)."""
    return color_transform_3x3(xyz, _XYZ_TO_RGB)


def _lab_f(t):
    delta = 6.0 / 29.0
    delta_cubed = delta ** 3
    factor = 1.0 / (3.0 * delta * delta)
    offset = 4.0 / 29.0
    return jnp.where(t > delta_cubed, jnp.cbrt(t), factor * t + offset)


def _lab_f_inv(t):
    delta = 6.0 / 29.0
    factor = 3.0 * delta * delta
    offset = 4.0 / 29.0
    return jnp.where(t > delta, t * t * t, factor * (t - offset))


def xyz_to_lab(xyz):
    """XYZ -> LAB normalized to L/100, a/128, b/128 (device_color_conversions.h:52-69)."""
    xyz = jnp.asarray(xyz)
    n = xyz / jnp.asarray(_D65_WHITE)
    fx = _lab_f(n[..., 0])
    fy = _lab_f(n[..., 1])
    fz = _lab_f(n[..., 2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack((L / 100.0, a / 128.0, b / 128.0), axis=-1)


def lab_to_xyz(lab):
    """Normalized LAB -> XYZ (device_color_conversions.h:71-90)."""
    lab = jnp.asarray(lab)
    L = lab[..., 0] * 100.0
    a = lab[..., 1] * 128.0
    b = lab[..., 2] * 128.0
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0
    xyz = jnp.stack((_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)), axis=-1)
    return xyz * jnp.asarray(_D65_WHITE)


def rgb_to_lab(rgb):
    return xyz_to_lab(rgb_to_xyz(rgb))


def lab_to_rgb(lab):
    return xyz_to_rgb(lab_to_xyz(lab))


def rgb_to_hsl(rgb):
    """RGB -> HSL (device_color_conversions.h:118-147)."""
    rgb = jnp.asarray(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    max_val = jnp.maximum(jnp.maximum(r, g), b)
    min_val = jnp.minimum(jnp.minimum(r, g), b)
    delta = max_val - min_val
    L = (max_val + min_val) * 0.5

    safe_delta = jnp.where(delta > 1e-6, delta, 1.0)
    s = jnp.where(
        delta > 1e-6,
        jnp.where(L < 0.5, delta / (max_val + min_val), delta / (2.0 - max_val - min_val)),
        0.0,
    )
    h_r = (g - b) / safe_delta + jnp.where(g < b, 6.0, 0.0)
    h_g = (b - r) / safe_delta + 2.0
    h_b = (r - g) / safe_delta + 4.0
    h = jnp.where(max_val == r, h_r, jnp.where(max_val == g, h_g, h_b))
    h = jnp.where(delta > 1e-6, h / 6.0, 0.0)
    return jnp.stack((h, s, L), axis=-1)


def _hsl_hue_to_rgb(p, q, t):
    t = jnp.where(t < 0.0, t + 1.0, t)
    t = jnp.where(t > 1.0, t - 1.0, t)
    return jnp.where(
        t < 1.0 / 6.0,
        p + (q - p) * 6.0 * t,
        jnp.where(
            t < 0.5,
            q,
            jnp.where(t < 2.0 / 3.0, p + (q - p) * (2.0 / 3.0 - t) * 6.0, p),
        ),
    )


def hsl_to_rgb(hsl):
    """HSL -> RGB (device_color_conversions.h:159-177)."""
    hsl = jnp.asarray(hsl)
    h, s, L = hsl[..., 0], hsl[..., 1], hsl[..., 2]
    q = jnp.where(L < 0.5, L * (1.0 + s), L + s - L * s)
    p = 2.0 * L - q
    rgb = jnp.stack(
        (
            _hsl_hue_to_rgb(p, q, h + 1.0 / 3.0),
            _hsl_hue_to_rgb(p, q, h),
            _hsl_hue_to_rgb(p, q, h - 1.0 / 3.0),
        ),
        axis=-1,
    )
    return jnp.where(s[..., None] == 0.0, L[..., None], rgb)


def modify_hsl(rgb, hue_adjust: float = 0.0, sat_adjust: float = 0.0, lum_adjust: float = 0.0):
    """HSL-space adjustment (device_color_conversions.h:189-197)."""
    hsl = rgb_to_hsl(rgb)
    new_hsl = jnp.stack(
        (
            jnp.mod(hsl[..., 0] + hue_adjust + 1.0, 1.0),
            jnp.clip(hsl[..., 1] + sat_adjust, 0.0, 1.0),
            jnp.clip(hsl[..., 2] + lum_adjust, 0.0, 1.0),
        ),
        axis=-1,
    )
    return _clip01(hsl_to_rgb(new_hsl))


# White-folded LAB matrices for the vibrance fast path: rgb_lin -> xyz/white
# and lab_f_inv -> rgb_lin in one 3x3 each (the D65 normalization is a
# per-row/column constant scale).
_RGB_TO_XYZ_D65N = _RGB_TO_XYZ / _D65_WHITE[:, None]
_XYZ_TO_RGB_D65N = _XYZ_TO_RGB * _D65_WHITE[None, :]


def modify_vibrance(rgb, amount: float = 0.0):
    """darktable vibrance: LAB chroma-weighted saturation boost with slight
    lightness cut (device_color_conversions.h:199-213).

    Computed in `_lab_f` space: L/a/b are affine in (fx, fy, fz), so the
    chroma-dependent scales apply directly to the f values -
    fy' = ls*fy + (16/116)(1-ls), fx' = ss*(fx-fy) + fy', fz' = fy' -
    ss*(fy-fz) - and the D65 white point folds into the two 3x3 matrices.
    This removes the L/a/b normalization round trip between the cbrt and
    cube stages; measured 7.06 -> 6.16 ms/frame on the full adaptive-ACES
    tail at 12MP (experiments/tail_vibrance_probe.py).  vs the
    literal-LAB formulation the result differs only by float rounding
    (measured <= 2e-5 max, <= 1 uint8 count; the divergence is rounding
    amplified by the pow(1/2.4) encode near zero, which bounds ANY
    arithmetic rearrangement away from bitwise) - far inside the 1e-3
    reference-parity budget, goldens green at their +/-1-count bar.
    """
    rgb = jnp.asarray(rgb)
    lin = srgb_to_linear(rgb)
    n = color_transform_3x3(lin, _RGB_TO_XYZ_D65N)
    fx = _lab_f(n[..., 0])
    fy = _lab_f(n[..., 1])
    fz = _lab_f(n[..., 2])
    # normalized a = 500(fx-fy)/128, b = 200(fy-fz)/128 (xyz_to_lab scales)
    a = (500.0 / 128.0) * (fx - fy)
    b = (200.0 / 128.0) * (fy - fz)
    chroma = jnp.sqrt(a * a + b * b)
    ls = 1.0 - amount * chroma * 0.25
    ss = 1.0 + amount * chroma
    fy2 = ls * fy + (16.0 / 116.0) * (1.0 - ls)
    fx2 = ss * (fx - fy) + fy2
    fz2 = fy2 - ss * (fy - fz)
    f_inv = jnp.stack(
        (_lab_f_inv(fx2), _lab_f_inv(fy2), _lab_f_inv(fz2)), axis=-1)
    return _clip01(linear_to_srgb(color_transform_3x3(f_inv, _XYZ_TO_RGB_D65N)))


def rgb_to_lab_l(rgb):
    """LAB L (normalized /100) of an RGB value."""
    return rgb_to_lab(rgb)[..., 0]


def compute_luminance(rgb):
    """(..., 3) -> (...) luminance = LAB L of clipped RGB (color_conversions.cu:170-174)."""
    return rgb_to_lab_l(_clip01(check_channels_last(jnp.asarray(rgb), 'rgb')))


def compute_log_luminance(rgb, eps: float = 1e-6):
    """(..., 3) -> (...) log-luminance (color_conversions.cu:176-185)."""
    lum = compute_luminance(rgb)
    return jnp.log(jnp.maximum(eps, lum))


def lab_modify_luminance(lab, new_luminance):
    """`modify_luminance` when the input's LAB is already at hand.

    The fused pipeline extracts luminance and writes it back around the
    denoise/bilateral/laplacian stages; computing the LAB once and reusing
    it here removes a full rgb_to_lab pass per stage (~1 ms/frame at 12MP).
    """
    lab = jnp.asarray(lab)
    new_luminance = jnp.asarray(new_luminance)
    lab = jnp.concatenate((new_luminance[..., None], lab[..., 1:]), axis=-1)
    return _clip01(lab_to_rgb(lab))


def rgb_to_lab_with_clipped_l(rgb):
    """(rgb_to_lab(rgb), compute_luminance(rgb)) sharing the sRGB gamma decode.

    Value-exact for every input: srgb_to_linear commutes with clip01 (both
    branches are monotonic and fix 0 and 1 exactly), so clipping the linear
    values reproduces compute_luminance's clip-then-linearize result while
    the expensive pow-2.4 decode runs once instead of twice.  The returned
    LAB is that of the *unclipped* input, as modify_luminance /
    modify_log_luminance require (device_color_conversions.h:179-188).
    """
    rgb = check_channels_last(jnp.asarray(rgb), 'rgb')
    lin = srgb_to_linear(rgb)
    lab = xyz_to_lab(color_transform_3x3(lin, _RGB_TO_XYZ))
    l_clipped = xyz_to_lab(color_transform_3x3(_clip01(lin), _RGB_TO_XYZ))[..., 0]
    return lab, l_clipped


def modify_luminance(rgb, new_luminance):
    """Replace LAB L with `new_luminance` via LAB round-trip
    (device_color_conversions.h:179-183)."""
    rgb = check_channels_last(jnp.asarray(rgb), 'rgb')
    new_luminance = jnp.asarray(new_luminance)
    if new_luminance.shape != rgb.shape[:-1]:
        raise RuntimeError(
            f'new_luminance shape {tuple(new_luminance.shape)} must match '
            f'rgb leading dims {tuple(rgb.shape[:-1])}'
        )
    return lab_modify_luminance(rgb_to_lab(rgb), new_luminance)


def modify_log_luminance(rgb, log_luminance, eps: float = 1e-4):
    """Replace LAB L with exp(log_luminance + eps) (device_color_conversions.h:185-188).

    Note: the reference adds eps inside the exp, matching its kernel exactly.
    """
    new_l = jnp.exp(jnp.asarray(log_luminance) + eps)
    return lab_modify_luminance(rgb_to_lab(rgb), new_l)


def rgb_to_gray(rgb):
    """Rec.601 luma used by the metrics kernels (device_math.h:460-462)."""
    rgb = jnp.asarray(rgb)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


__all__ = [
    'color_transform_3x3',
    'compute_log_luminance',
    'compute_luminance',
    'hsl_to_rgb',
    'lab_modify_luminance',
    'lab_to_rgb',
    'lab_to_xyz',
    'linear_to_srgb',
    'modify_hsl',
    'modify_log_luminance',
    'modify_luminance',
    'modify_vibrance',
    'rgb_to_gray',
    'rgb_to_hsl',
    'rgb_to_lab',
    'rgb_to_lab_l',
    'rgb_to_lab_with_clipped_l',
    'rgb_to_xyz',
    'srgb_to_linear',
    'xyz_to_lab',
    'xyz_to_linear_rgb',
    'xyz_to_rgb',
]
