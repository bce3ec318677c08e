"""Demosaic: bilinear 5x5 and PPG, plus the shared border interpolation.

TPU-native rebuild of csrc/debayer/bilinear.cu and csrc/debayer/ppg.cu.  The
reference launches 3-4 CUDA kernels with shared-memory aprons per frame; here
each algorithm is a single pure function of (H, W) Bayer -> (H, W, 3) RGB
built from statically shifted slices (see ops/_stencil.py) that XLA fuses
into one pass.  Boundary semantics (zero-fill tiles, border rings, write
guards) replicate the reference exactly so float32 outputs stay within
parity tolerance everywhere.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .._validate import as_mosaic
from .bayer import BayerPattern, fc, fc_tile, pixel_order
from ._stencil import Shifter, interior_mask, row_col_iota, site_masks, tile2x2_map

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Bilinear 5x5 (bilinear.cu)
# ---------------------------------------------------------------------------

# Diamond 5x5 offsets, 13 taps, as (dx, dy) pairs - CUDA int2 is (x, y)
# (bilinear.cu:17-25)
_DIAMOND_OFFSETS = [
    (-2, 0),
    (-1, -1), (-1, 0), (-1, 1),
    (0, -2), (0, -1), (0, 0), (0, 1), (0, 2),
    (1, -1), (1, 0), (1, 1),
    (2, 0),
]

# Per-pixel-type kernels (R, G1, G2, B) x 13 taps x RGB (bilinear.cu:28-61)
_DIAMOND_KERNELS = np.array(
    [
        # Type 0: R pixel
        [
            [0, -2, -3],
            [0, 0, 4], [0, 4, 0], [0, 0, 4],
            [0, -2, -3], [0, 4, 0], [16, 8, 12], [0, 4, 0], [0, -2, -3],
            [0, 0, 4], [0, 4, 0], [0, 0, 4],
            [0, -2, -3],
        ],
        # Type 1: G1 pixel
        [
            [-2, 0, 1],
            [-2, 0, -2], [8, 0, 0], [-2, 0, -2],
            [1, 0, -2], [0, 0, 8], [10, 16, 10], [0, 0, 8], [1, 0, -2],
            [-2, 0, -2], [8, 0, 0], [-2, 0, -2],
            [-2, 0, 1],
        ],
        # Type 2: G2 pixel
        [
            [1, 0, -2],
            [-2, 0, -2], [0, 0, 8], [-2, 0, -2],
            [-2, 0, 1], [8, 0, 0], [10, 16, 10], [8, 0, 0], [-2, 0, 1],
            [-2, 0, -2], [0, 0, 8], [-2, 0, -2],
            [1, 0, -2],
        ],
        # Type 3: B pixel
        [
            [-3, -2, 0],
            [4, 0, 0], [0, 4, 0], [4, 0, 0],
            [-3, -2, 0], [0, 4, 0], [12, 8, 16], [0, 4, 0], [-3, -2, 0],
            [4, 0, 0], [0, 4, 0], [4, 0, 0],
            [-3, -2, 0],
        ],
    ],
    dtype=np.float32,
)


def _pixel_type_tiles(pattern: BayerPattern) -> np.ndarray:
    """(2, 2) map of pixel type (0=R,1=G1,2=G2,3=B) per cell site.

    The reference maps cell index C -> type via per-pattern order arrays
    (bayer_device.h:19-33); C = 2*(y&1) + (x&1).
    """
    order = pixel_order(pattern)
    return np.array([[order[0], order[1]], [order[2], order[3]]], dtype=np.int32)


def bilinear5x5_demosaic(image, pattern: BayerPattern):
    """13-tap diamond bilinear demosaic (bilinear.cu:66-148).

    Args:
        image: (H, W) or (H, W, 1) Bayer mosaic, float32.
        pattern: CFA pattern.

    Returns:
        (H, W, 3) RGB.
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    h, w = x.shape
    s = Shifter(x, 2, mode='edge')  # clamp-to-edge sampling (bilinear.cu:90)

    type_tile = _pixel_type_tiles(pattern)
    # Per-tap weight maps: weight depends on pixel type which is 2x2 periodic.
    # Accumulate per channel in plain values (no .at updates - each would be
    # a dynamic-update-slice op); the normalizers are 2x2-periodic constants.
    accs = [jnp.zeros((h, w), dtype=_F32) for _ in range(3)]
    for k, (dx, dy) in enumerate(_DIAMOND_OFFSETS):
        v = s(dy, dx)
        for c in range(3):
            wtile = _DIAMOND_KERNELS[type_tile, k, c]  # (2,2) weights by site
            wmap = tile2x2_map(h, w, wtile).astype(_F32)
            accs[c] = accs[c] + v * wmap
    norm_tiles = _DIAMOND_KERNELS[type_tile].sum(axis=2)  # (2,2,3) per-site sums
    out = [
        accs[c] / tile2x2_map(h, w, norm_tiles[..., c]).astype(_F32)
        for c in range(3)
    ]
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Border interpolation (ppg.cu:342-389, shared by PPG and RCD)
# ---------------------------------------------------------------------------

def border_interpolate(image, pattern: BayerPattern, border: int):
    """3x3 per-channel averaging over the `border`-wide ring.

    Returns a full (H, W, 3) image; callers select the ring.  Interior values
    are also valid averages (the reference leaves interior untouched and the
    caller overwrites it).
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    h, w = x.shape
    pos = jnp.maximum(x, 0.0)
    masks = _code_masks(h, w, pattern)

    sums = {}
    counts = {}
    for code in range(4):
        m = masks[code].astype(_F32)
        sm = Shifter(pos * m, 1, mode='constant')
        cm = Shifter(m, 1, mode='constant')
        ssum = 0.0
        csum = 0.0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ssum = ssum + sm(dy, dx)
                csum = csum + cm(dy, dx)
        sums[code] = ssum
        counts[code] = csum

    i = pos
    o_r = jnp.where(counts[0] > 0, sums[0] / jnp.maximum(counts[0], 1.0), i)
    cg = counts[1] + counts[3]
    o_g = jnp.where(cg > 0, (sums[1] + sums[3]) / jnp.maximum(cg, 1.0), i)
    o_b = jnp.where(counts[2] > 0, sums[2] / jnp.maximum(counts[2], 1.0), i)

    # Override the pixel's own channel with its raw value.
    o_r = jnp.where(masks[0], i, o_r)
    o_g = jnp.where(masks[1] | masks[3], i, o_g)
    o_b = jnp.where(masks[2], i, o_b)
    return jnp.stack((o_r, o_g, o_b), axis=-1)


def _code_masks(h, w, pattern: BayerPattern):
    """fc-code -> boolean map; codes 0..3 (3 = second green row's G site).

    For the four supported patterns fc() never returns 3 (greens are code 1
    at both sites), but the reference distinguishes green rows by (y & 1), so
    we expose code 3 as "green on odd rows" to mirror border_interpolate's
    count[1]+count[3] merge and green-equilibration's green1/green2 split.
    """
    tile = fc_tile(pattern)
    rows, cols = row_col_iota(h, w)
    rp, cp = rows & 1, cols & 1
    masks = {}
    for code in range(4):
        m = jnp.zeros((h, w), dtype=bool)
        for pr in range(2):
            for pc in range(2):
                t = tile[pr, pc]
                eff = t
                if t == 1 and pr == 1:
                    eff = 3  # second green site lives on odd rows for all patterns
                if eff == code:
                    m = m | ((rp == pr) & (cp == pc))
        masks[code] = m
    return masks


# ---------------------------------------------------------------------------
# PPG pre-median (ppg.cu:21-113)
# ---------------------------------------------------------------------------

_MEDIAN_OFFSETS = [
    (-2, 0),
    (-1, -1), (-1, 1),
    (0, -2), (0, 0), (0, 2),
    (1, -1), (1, 1),
    (2, 0),
]


def pre_median(image, pattern: BayerPattern, threshold: float):
    """Thresholded 9-point same-color diamond median on green sites.

    `threshold` is the already-scaled value (the caller divides by 100, see
    ppg.cu:449).
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    h, w = x.shape
    s = Shifter(x, 2, mode='constant')
    center = s(0, 0)

    meds = []
    cnt = jnp.zeros((h, w), dtype=jnp.int32)
    for dy, dx in _MEDIAN_OFFSETS:
        v = s(dy, dx)
        passes = jnp.abs(v - center) < threshold
        meds.append(jnp.where(passes, v, 64.0 + v))
        cnt = cnt + passes.astype(jnp.int32)

    from ._stencil import sort9

    med = sort9(meds)  # 9 sorted planes (CE network - TPU-friendly)

    target_single = med[4] - 64.0
    # med[(cnt-1)//2]: cnt in [1, 9] so only ranks 0..4 are reachable.
    idx = jnp.clip((cnt - 1) // 2, 0, 4)
    target_multi = med[0]
    for r in range(1, 5):
        target_multi = jnp.where(idx == r, med[r], target_multi)
    target = jnp.where(cnt == 1, target_single, target_multi)

    delta = jnp.clip(target - center, -threshold, threshold)
    greened = center + delta

    masks = _code_masks(h, w, pattern)
    is_green = masks[1] | masks[3]
    color = jnp.where(is_green, greened, center)
    return jnp.maximum(color, 0.0)


# ---------------------------------------------------------------------------
# PPG green / red-blue passes (ppg.cu:120-224, :230-337)
# ---------------------------------------------------------------------------

def ppg_green(image, pattern: BayerPattern, clamp_input: bool = False):
    """Gradient-weighted green interpolation at R/B sites.

    Returns full (H, W, 3) with sparse R/B planted; only pixels in the
    [3, size-4] interior are meaningful (caller masks).  `clamp_input`
    replicates the fmaxf(0, .) tile loads of rcd_border_green (rcd.cu:320)
    vs. the raw loads of ppg_demosaic_green (ppg.cu:158).
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    if clamp_input:
        x = jnp.maximum(x, 0.0)
    h, w = x.shape
    s = Shifter(x, 3, mode='constant')
    pc = s(0, 0)

    pym, pym2, pym3 = s(-1, 0), s(-2, 0), s(-3, 0)
    pyM, pyM2, pyM3 = s(1, 0), s(2, 0), s(3, 0)
    pxm, pxm2, pxm3 = s(0, -1), s(0, -2), s(0, -3)
    pxM, pxM2, pxM3 = s(0, 1), s(0, 2), s(0, 3)

    guessx = (pxm + pc + pxM) * 2.0 - pxM2 - pxm2
    diffx = (
        (jnp.abs(pxm2 - pc) + jnp.abs(pxM2 - pc) + jnp.abs(pxm - pxM)) * 3.0
        + (jnp.abs(pxM3 - pxM) + jnp.abs(pxm3 - pxm)) * 2.0
    )
    guessy = (pym + pc + pyM) * 2.0 - pyM2 - pym2
    diffy = (
        (jnp.abs(pym2 - pc) + jnp.abs(pyM2 - pc) + jnp.abs(pym - pyM)) * 3.0
        + (jnp.abs(pyM3 - pyM) + jnp.abs(pym3 - pym)) * 2.0
    )

    gy = jnp.clip(guessy * 0.25, jnp.minimum(pym, pyM), jnp.maximum(pym, pyM))
    gx = jnp.clip(guessx * 0.25, jnp.minimum(pxm, pxM), jnp.maximum(pxm, pxM))
    green_guess = jnp.where(diffx > diffy, gy, gx)

    masks = site_masks(h, w, pattern)
    green = jnp.where(masks['g'], pc, green_guess)

    r = jnp.where(masks['r'], pc, 0.0)
    b = jnp.where(masks['b'], pc, 0.0)
    out = jnp.stack((r, green, b), axis=-1)
    return jnp.maximum(out, 0.0)


def ppg_redblue(rgb, pattern: BayerPattern, clamp_input: bool = False):
    """R/B completion from green-filled sparse RGB.

    Green sites take R/B from the 4-neighborhood; R/B sites take the
    opposite color from the diagonal star with smaller-gradient selection.
    1-px image edge passes through unchanged (clamped >= 0).  `clamp_input`
    replicates rcd_border_redblue's clamped tile loads (rcd.cu:423-427).
    """
    rgb = jnp.asarray(rgb, dtype=_F32)
    h, w = rgb.shape[:2]
    src = jnp.maximum(rgb, 0.0) if clamp_input else rgb
    ch = jnp.moveaxis(src, -1, 0)  # (3, H, W)
    s = Shifter(ch, 1, mode='constant')

    c0 = s(0, 0)
    nt, nb, nl, nr = s(-1, 0), s(1, 0), s(0, -1), s(0, 1)
    ntl, ntr, nbl, nbr = s(-1, -1), s(-1, 1), s(1, -1), s(1, 1)

    g = c0[1]

    # Green sites: which horizontal neighbor is red (fc(row, col+1) == 0)?
    masks = site_masks(h, w, pattern)
    rows, cols = row_col_iota(h, w)
    tile = fc_tile(pattern)
    red_in_row = tile2x2_map(h, w, np.array(
        [[1 if fc(r, c + 1, pattern) == 0 else 0 for c in range(2)] for r in range(2)],
        dtype=np.int32)) == 1

    # red neighbor in same row: B from vertical, R from horizontal
    b_v = (nt[2] + nb[2] + 2.0 * g - nt[1] - nb[1]) * 0.5
    r_h = (nl[0] + nr[0] + 2.0 * g - nl[1] - nr[1]) * 0.5
    # blue neighbor in same row: R from vertical, B from horizontal
    r_v = (nt[0] + nb[0] + 2.0 * g - nt[1] - nb[1]) * 0.5
    b_h = (nl[2] + nr[2] + 2.0 * g - nl[1] - nr[1]) * 0.5

    green_r = jnp.where(red_in_row, r_h, r_v)
    green_b = jnp.where(red_in_row, b_v, b_h)

    def _diag_fill(chan):
        diff1 = jnp.abs(ntl[chan] - nbr[chan]) + jnp.abs(ntl[1] - g) + jnp.abs(nbr[1] - g)
        guess1 = ntl[chan] + nbr[chan] + 2.0 * g - ntl[1] - nbr[1]
        diff2 = jnp.abs(ntr[chan] - nbl[chan]) + jnp.abs(ntr[1] - g) + jnp.abs(nbl[1] - g)
        guess2 = ntr[chan] + nbl[chan] + 2.0 * g - ntr[1] - nbl[1]
        return jnp.where(
            diff1 > diff2,
            guess2 * 0.5,
            jnp.where(diff1 < diff2, guess1 * 0.5, (guess1 + guess2) * 0.25),
        )

    blue_at_red = _diag_fill(2)
    red_at_blue = _diag_fill(0)

    out_r = jnp.where(masks['g'], green_r, jnp.where(masks['b'], red_at_blue, c0[0]))
    out_g = g
    out_b = jnp.where(masks['g'], green_b, jnp.where(masks['r'], blue_at_red, c0[2]))

    edge = (rows == 0) | (cols == 0) | (rows == h - 1) | (cols == w - 1)
    out_r = jnp.where(edge, c0[0], out_r)
    out_b = jnp.where(edge, c0[2], out_b)

    out = jnp.stack((out_r, out_g, out_b), axis=-1)
    return jnp.maximum(out, 0.0)


def ppg_demosaic(image, pattern: BayerPattern, median_threshold: float = 0.0):
    """Full PPG pipeline: border fill -> optional pre-median -> green ->
    red/blue (PPGImpl::process, ppg.cu:413-464).

    Args:
        image: (H, W) or (H, W, 1) Bayer, float32.
        median_threshold: raw threshold; scaled by 1/100 like the binding.

    Returns:
        (H, W, 3) RGB.
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    h, w = x.shape

    src = x
    if median_threshold > 0.0:
        src = pre_median(x, pattern, median_threshold / 100.0)

    green = ppg_green(src, pattern)

    # border_interpolate only survives in the 3-px ring of `temp`
    # (ppg.cu:436-441 composition), so run it on 8-px edge strips instead of
    # the full image and assemble by concatenation.
    strip = 8
    if h <= 2 * strip + 2 or w <= 2 * strip + 2:
        border = border_interpolate(x, pattern, 3)
        inner = interior_mask(h, w, 3)
        temp = jnp.where(inner[..., None], green, border)
    else:
        top = border_interpolate(x[:strip], pattern, 3)[:3]
        bottom = border_interpolate(x[-strip:], pattern, 3)[-3:]
        left = border_interpolate(x[:, :strip], pattern, 3)[3 : h - 3, :3]
        right = border_interpolate(x[:, -strip:], pattern, 3)[3 : h - 3, -3:]
        mid = jnp.concatenate([left, green[3 : h - 3, 3 : w - 3], right], axis=1)
        temp = jnp.concatenate([top, mid, bottom], axis=0)

    return ppg_redblue(temp, pattern)


__all__ = [
    'bilinear5x5_demosaic',
    'border_interpolate',
    'ppg_demosaic',
    'ppg_green',
    'ppg_redblue',
    'pre_median',
]
