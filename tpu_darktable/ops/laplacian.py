"""Local-Laplacian local contrast (darktable "local laplacian").

TPU-native rebuild of csrc/local_contrast/laplacian.cu.  The reference
builds fp16 Gaussian pyramids of the padded luminance plus num_gamma
remapped copies, then assembles coarse-to-fine picking Laplacian
coefficients from the two gamma pyramids bracketing each pixel's value.
Here pyramids are Python lists of arrays with static per-level shapes (jit
specializes on the geometry), the reduce/expand stencils are strided slices
XLA turns into fused conv-like code, and the reference's fp16 storage
between stages is emulated by a configurable storage dtype so float32
outputs track the CUDA implementation.

Geometry matches LaplacianImpl: num_levels = min(30, floor(log2(min(w, h))))
(laplacian.cu:415), max_supp = 1 << (num_levels - 1), clamp-to-edge padding
(pad_input, :70-86), boundary-clamped expansion (clamp_boundary, :52-66).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

_F32 = jnp.float32
MAX_LEVELS = 30  # laplacian.h:10


@dataclass(frozen=True)
class LaplacianParams:
    """Mirror of the reference LaplacianParams (local_contrast.py:11-19)."""

    num_gamma: int = 6
    sigma: float = 0.2
    shadows: float = 1.0
    highlights: float = 1.0
    clarity: float = 0.0


def _dl(x: int, level: int) -> int:
    """Level dimension: ceil division by 2^level (laplacian.cu:47)."""
    return (x + (1 << level) - 1) >> level


def num_levels_for(width: int, height: int) -> int:
    return min(MAX_LEVELS, int(math.floor(math.log2(min(width, height)))))


def curve_deviation(params: LaplacianParams) -> float:
    """Upper bound on |curve(x, g) - x| over x in [0, 1+sigma], any g.

    The remap curve (laplacian.cu:266-290) decomposes as identity + delta:
    the linear branch gives delta = (shadhi - 1)(c - ssigma), the bezier
    branch |delta| <= |shadhi - 1| * 2 sigma, and the clarity term peaks at
    |clarity| * sigma/sqrt(3) * e^{-1/2} ~= 0.35 sigma |clarity|.
    """
    dev_sh = max(abs(params.shadows - 1.0), abs(params.highlights - 1.0))
    return dev_sh * (1.0 + params.sigma) + 0.35 * params.sigma * abs(params.clarity)


def auto_max_supp(
    width: int,
    height: int,
    params: LaplacianParams,
    pad_tolerance: float = 0.0,
) -> int:
    """Smallest boundary pad reproducing the reference full-pad result.

    The reference always pads by 1 << (n_levels - 1) (laplacian.cu:415-418),
    2.5x the pixel count at 12MP.  The output's pad dependence is carried
    entirely by the curve's deviation from identity: writing curve = id +
    delta, the identity component telescopes exactly through the
    coarse-to-fine assembly (output_l = expand(output_{l+1}) + (padded_l -
    expand(padded_{l+1})) collapses to output_l = padded_l by induction, at
    every position of every level, for any pad).  Hence:

    - delta == 0 (shadows == highlights == 1, clarity == 0, the parameter
      defaults): ANY pad is exact - with fp16 pyramid storage bitwise so,
      since per-stage float32 rounding error (~2^-23 relative) is far below
      the fp16 half-ulp (2^-12) the storage rounds through.  A token pad
      of 32 keeps every level >= 3 px for the boundary clamps.
    - delta != 0: pad effects enter only through levels whose outer-edge
      clamp rows reach the crop's dependence cone (levels with
      8 * 2^l > pad; the corrupted margin fixed point is ~4 level-pixels).
      Each such level contributes O(curve_deviation) to the crop.  With
      pad_tolerance == 0 (default) the exact full pad is used; a positive
      tolerance admits the smallest pad whose calibrated bound
      0.01 * curve_deviation * n_corrupted_levels stays within it.
    """
    n_levels = num_levels_for(width, height)
    full = 1 << (n_levels - 1)
    dev = curve_deviation(params)
    if dev == 0.0:
        return min(32, full)
    if pad_tolerance > 0.0:
        pad = 32
        while pad < full:
            n_corrupt = sum(1 for l in range(n_levels) if (8 << l) > pad)
            if 0.01 * dev * n_corrupt <= pad_tolerance:
                return pad
            pad *= 2
    return full


def _gauss_reduce(fine, ch: int, cw: int, storage):
    """5x5 [1,4,6,4,1]/16 reduce with edge rows copied from their neighbors
    (gauss_reduce_half, laplacian.cu:178-218)."""
    f = fine.astype(_F32)
    w = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0
    p = jnp.pad(f, ((2, 6), (2, 6)))
    rows = 0.0
    for j in range(5):
        rows = rows + w[j] * p[j : j + 2 * ch : 2, :]
    out = 0.0
    for i in range(5):
        out = out + w[i] * rows[:, i : i + 2 * cw : 2]
    # boundary: pos 0 copies pos 1; pos n-1 copies pos n-2 (concatenation,
    # not .at updates - dynamic-update-slice ops are expensive here)
    out = jnp.concatenate([out[1:2], out[1:-1], out[-2:-1]], axis=0)
    out = jnp.concatenate([out[:, 1:2], out[:, 1:-1], out[:, -2:-1]], axis=1)
    return out.astype(storage)


def _expand_axis(c, n_fine: int, axis: int):
    """Zero-stuffed 5-tap expand along one axis (no x4 factor)."""
    c = jnp.moveaxis(c, axis, 0)
    n_c = c.shape[0]
    cp = jnp.pad(c, ((1, 1),) + ((0, 0),) * (c.ndim - 1))
    even = (cp[:-2] + 6.0 * cp[1:-1] + cp[2:]) / 16.0  # (n_c, ...)
    odd = 4.0 * (cp[1:-1] + cp[2:]) / 16.0
    inter = jnp.stack((even, odd), axis=1).reshape((2 * n_c,) + c.shape[1:])
    return jnp.moveaxis(inter[:n_fine], 0, axis)


def _clamp_idx(n: int) -> np.ndarray:
    """clamp_boundary for one axis (laplacian.cu:52-66)."""
    hi = n - 2 if (n & 1) else n - 3
    return np.clip(np.arange(n), 1, hi)


def _expand_clamped(coarse, fh: int, fw: int):
    """expand_gaussian evaluated at clamp_boundary'd positions
    (laplacian.cu:111-141 + :221-233)."""
    e = _expand_axis(_expand_axis(coarse.astype(_F32), fh, 0), fw, 1) * 4.0
    ry = jnp.asarray(_clamp_idx(fh))
    cx = jnp.asarray(_clamp_idx(fw))
    return e[ry][:, cx]


def _curve(x, g, sigma, shadows, highlights, clarity):
    """Shadows/highlights remap curve (laplacian.cu:266-290)."""
    c = x - g
    ssigma = jnp.where(c > 0.0, sigma, -sigma)
    shadhi = jnp.where(c > 0.0, shadows, highlights)
    linear = g + ssigma + shadhi * (c - ssigma)
    t = jnp.clip(c / (2.0 * ssigma), 0.0, 1.0)
    t2 = t * t
    mt = 1.0 - t
    bezier = g + ssigma * 2.0 * mt * t + t2 * (ssigma + ssigma * shadhi)
    val = jnp.where(jnp.abs(c) > 2.0 * sigma, linear, bezier)
    return val + clarity * c * jnp.exp(-c * c / (2.0 * sigma * sigma / 3.0))


def local_laplacian(
    mono,
    params: LaplacianParams = LaplacianParams(),
    storage_dtype=jnp.float16,
    max_supp: int | str | None = 'auto',
    pad_tolerance: float = 0.0,
):
    """Local-Laplacian filter an (H, W) luminance plane
    (LaplacianImpl::process, laplacian.cu:442-479).

    `storage_dtype` emulates the reference's fp16 pyramid storage
    (float16 for parity; float32/bfloat16 for speed on TPU).

    `max_supp` overrides the boundary pad (reference: 1 << (n_levels - 1),
    laplacian.cu:416).  The default 'auto' picks the smallest pad that
    provably reproduces the full-pad result from the actual parameter
    values (see auto_max_supp: neutral shadows/highlights/clarity make the
    remap curve the identity, for which any pad is exact; non-neutral
    params keep the exact reference pad unless `pad_tolerance` admits a
    bounded-error smaller one).  None = always the reference full pad.
    """
    x = jnp.asarray(mono, dtype=_F32)
    if x.ndim != 2:
        raise RuntimeError(
            f'mono must be a 2-D (H, W) plane, got shape {tuple(x.shape)}'
        )
    h, w = x.shape
    ng = params.num_gamma
    sigma, shadows = params.sigma, params.shadows
    highlights, clarity = params.highlights, params.clarity

    n_levels = num_levels_for(w, h)
    if max_supp == 'auto':
        max_supp = auto_max_supp(w, h, params, pad_tolerance)
    elif max_supp is None:
        max_supp = 1 << (n_levels - 1)
    bw, bh = w + 2 * max_supp, h + 2 * max_supp

    dims = [(_dl(bh, l), _dl(bw, l)) for l in range(n_levels)]

    # pad_input_half: clamp-to-edge pad (laplacian.cu:90-107)
    padded0 = jnp.pad(x, ((max_supp, max_supp), (max_supp, max_supp)), mode='edge')
    padded = [padded0.astype(storage_dtype)]
    for l in range(1, n_levels):
        ch, cw = dims[l]
        padded.append(_gauss_reduce(padded[l - 1], ch, cw, storage_dtype))

    # gamma-remapped pyramids (process_curve_half + reduces, laplacian.cu:531-554)
    processed = []
    base = padded[0].astype(_F32)
    for k in range(ng):
        g = (k + 0.5) / ng
        pyr = [_curve(base, g, sigma, shadows, highlights, clarity).astype(storage_dtype)]
        for l in range(1, n_levels):
            ch, cw = dims[l]
            pyr.append(_gauss_reduce(pyr[l - 1], ch, cw, storage_dtype))
        processed.append(pyr)

    # coarse-to-fine assembly (laplacian_assemble, laplacian.cu:221-252)
    output = padded[n_levels - 1]  # top level of the plain pyramid
    for l in range(n_levels - 2, -1, -1):
        fh, fw = dims[l]
        recon = _expand_clamped(output.astype(_F32), fh, fw)

        v = padded[l].astype(_F32)
        t = v * ng - 0.5
        hi = jnp.clip(jnp.floor(t).astype(jnp.int32) + 1, 1, ng - 1)
        lo = hi - 1
        a = jnp.clip(t - lo.astype(_F32), 0.0, 1.0)

        lap = jnp.zeros((fh, fw), dtype=_F32)
        for k in range(ng):
            lk = processed[k][l].astype(_F32) - _expand_clamped(
                processed[k][l + 1].astype(_F32), fh, fw
            )
            wk = jnp.where(lo == k, 1.0 - a, jnp.where(hi == k, a, 0.0))
            lap = lap + lk * wk

        output = (recon + lap).astype(storage_dtype)

    # write_back_half (laplacian.cu:372-386)
    return output.astype(_F32)[max_supp : max_supp + h, max_supp : max_supp + w]


__all__ = [
    'LaplacianParams',
    'auto_max_supp',
    'curve_deviation',
    'local_laplacian',
    'num_levels_for',
]
