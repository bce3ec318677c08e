"""Bilateral-grid local contrast boost on luminance.

TPU-native rebuild of csrc/local_contrast/bilateral.cu (darktable bilateral
grid).  The reference splats every pixel into a 3-D grid with trilinear
atomics (bilateral.cu:56-69, :99-112); atomically-scattered splats are the
worst case for XLA/TPU, so the design here exploits structure instead:

- the x/y grid coordinates are *data-independent* (pos / sigma_s), so the
  spatial splat is a fixed banded linear operator per axis.  It is applied
  as a windowed gather-and-weight (each grid row/column pulls from a static
  pixel window), which is exact, linear-time, and scatter-free;
- only the z (luminance) coordinate is data-dependent; the grid is built one
  z-slab at a time inside a small static loop (Z <= 50, typically ~6), with
  the per-slab tent weights computed as elementwise ops;
- the 5-tap grid blurs and the z-derivative blur keep the reference's
  truncated-edge behaviour (zero-pad semantics, bilateral.cl heritage,
  bilateral.cu:132-204);
- the slice is the transposed windowed gather plus a per-slab tent-weighted
  accumulation (bilateral.cu:208-228).

Grid sizing matches BilateralImpl::compute_grid_size (bilateral.cu:273-299);
splat/slice use the *original* sigmas like the reference's process() does.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

try:  # fused Pallas blur cascade (TPU); per-axis XLA passes fall back
    from ..kernels.grid_blur import (
        grid_blur_xyz as _grid_blur_xyz,
        grid_blur_vmem_ok as _grid_blur_vmem_ok,
    )
except Exception:  # pragma: no cover - pallas unavailable on exotic setups
    _grid_blur_xyz = None

try:  # fully-fused splat/blur/slice kernel (integer-sigma fast path)
    from ..kernels.bilateral_fused import bilateral_fused as _bilateral_fused
except Exception:  # pragma: no cover
    _bilateral_fused = None

try:  # band-resident fused kernel, generation 2 (the TPU default path)
    from ..kernels.bilateral_band import (
        bilateral_band as _bilateral_band,
        bilateral_band_vmem_ok as _bilateral_band_vmem_ok,
        riffle_phases as _riffle_phases,
    )
except Exception:  # pragma: no cover
    _bilateral_band = None

_F32 = jnp.float32


def compute_grid_size(width: int, height: int, sigma_s: float, sigma_r: float):
    """(X, Y, Z) grid dims (bilateral.cu:273-299)."""
    ss = max(sigma_s, 0.5)
    l_range = 1.0

    def _clamp(v, lo, hi):
        return min(max(v, lo), hi)

    gx = _clamp(round(width / ss), 4.0, 3000.0)
    gy = _clamp(round(height / ss), 4.0, 3000.0)
    gz = _clamp(round(l_range / sigma_r), 4.0, 50.0)

    eff_sigma_s = max(height / gy, width / gx)
    eff_sigma_r = l_range / gz
    return (
        int(math.ceil(width / eff_sigma_s)) + 1,
        int(math.ceil(height / eff_sigma_s)) + 1,
        int(math.ceil(l_range / eff_sigma_r)) + 1,
    )


def _axis_splat_operator(n_pixels: int, n_cells: int, sigma: float):
    """Static windowed splat weights for one spatial axis.

    Pixel p lands at g = clamp(p/sigma, 0, n_cells-1), contributing
    (1-frac) to cell ib = min(floor(g), n_cells-2) and frac to ib+1
    (make_grid_sample, bilateral.cu:71-87).  Returns (idx, wgt, tail_start)
    where (idx, wgt) have shape (n_cells, M): cell c accumulates
    sum_m wgt[c, m] * value[idx[c, m]].

    Pixels at or beyond sigma*(n_cells-1) land exactly on the LAST cell
    with weight 1.0 (their grid coordinate clamps, so frac == 1 against
    cell n_cells-2).  They are excluded from the windowed operator and
    reported via tail_start: the caller adds value[tail_start:].sum() to
    the last cell.  With strong grid clamping (small sigma at large
    images; the grid caps at 3000 cells per axis, bilateral.cu:282-284)
    thousands of pixels pile onto that cell, and keeping them in the dense
    window makes the gather explode (40 GB at sigma_s=1, 12MP).
    """
    p = np.arange(n_pixels, dtype=np.float64)
    g = np.clip(p / sigma, 0.0, n_cells - 1)
    ib = np.minimum(g.astype(np.int64), n_cells - 2)
    frac = (g - ib).astype(np.float32)
    # g is nondecreasing: everything from the first g == n_cells-1 on is tail
    tail_start = int(np.searchsorted(g, n_cells - 1, side='left'))
    in_window = np.arange(n_pixels) < tail_start

    m_width = int(np.ceil(sigma)) + 2
    idx = np.zeros((n_cells, m_width), dtype=np.int32)
    wgt = np.zeros((n_cells, m_width), dtype=np.float32)
    for c in range(n_cells):
        members = np.nonzero(((ib == c - 1) | (ib == c)) & in_window)[0]
        if len(members) > m_width:  # widen if needed (fractional-sigma jitter)
            extra = len(members) - m_width
            idx = np.pad(idx, ((0, 0), (0, extra)))
            wgt = np.pad(wgt, ((0, 0), (0, extra)))
            m_width = len(members)
        for m, px in enumerate(members):
            idx[c, m] = px
            wgt[c, m] = frac[px] if ib[px] == c - 1 else 1.0 - frac[px]
    return idx, wgt, tail_start


def _xy_splat_windowed(img, h, w, gx, gy, jidx_x, jwgt_x, tail_x,
                       jidx_y, jwgt_y, tail_y):
    """Separable spatial splat of an (H, W) map -> (gy, gx) via the static
    windowed operators, with the clamped tails (weight-1.0 pileup on the
    last cell, see _axis_splat_operator) added as plain sums."""
    gathered = img[:, jidx_x.reshape(-1)].reshape(h, gx, -1)
    sx = jnp.sum(gathered * jwgt_x[None], axis=-1)
    if tail_x < w:
        sx = jnp.concatenate(
            [sx[:, :-1],
             sx[:, -1:] + img[:, tail_x:].sum(axis=1, keepdims=True)],
            axis=1)
    gathered = sx[jidx_y.reshape(-1), :].reshape(gy, -1, gx)
    out = jnp.sum(gathered * jwgt_y[:, :, None], axis=1)
    if tail_y < h:
        out = jnp.concatenate(
            [out[:-1],
             out[-1:] + sx[tail_y:].sum(axis=0, keepdims=True)],
            axis=0)
    return out


def _axis_slice_weights(n_pixels: int, n_cells: int, sigma: float):
    """Static gather weights for slicing: pixel p reads cells ib, ib+1."""
    p = np.arange(n_pixels, dtype=np.float64)
    g = np.clip(p / sigma, 0.0, n_cells - 1)
    ib = np.minimum(g.astype(np.int64), n_cells - 2).astype(np.int32)
    frac = (g - ib).astype(np.float32)
    return ib, frac


def _blur_xyz(grid, z_weights_mode: str, use_pallas: bool | None,
              interpret: bool = False):
    """x/y gaussian + z (derivative|gaussian) blur chain.

    Uses the fused Pallas kernel (kernels/grid_blur.py, one HBM round trip
    instead of three) on the TPU backend when the band fits VMEM; falls
    back to the three per-axis XLA passes.  Outputs agree to float
    rounding (1 ulp; accumulation-order only)."""
    w_gauss = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
    w_deriv = (-2.0 / 16.0, -4.0 / 16.0, 0.0, 4.0 / 16.0, 2.0 / 16.0)
    gz, _, gx = grid.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas and _grid_blur_xyz is not None:
        for bh in (64, 32, 16, 8):
            if _grid_blur_vmem_ok(gz, gx, bh):
                return _grid_blur_xyz(grid, bh=bh, z_mode=z_weights_mode,
                                      interpret=interpret)
    grid = _blur5(grid, 2, w_gauss)
    grid = _blur5(grid, 1, w_gauss)
    wz = w_deriv if z_weights_mode == 'derivative' else w_gauss
    return _blur5(grid, 0, wz)


def _blur5(grid, axis: int, weights):
    """5-tap correlation along `axis` with zero boundary (truncated taps),
    matching blur_line / blur_line_z edge handling (bilateral.cu:132-204)."""
    pads = [(0, 0)] * grid.ndim
    pads[axis] = (2, 2)
    p = jnp.pad(grid, pads)
    n = grid.shape[axis]
    out = 0.0
    for t, wt in enumerate(weights):
        if wt == 0.0:
            continue
        sl = [slice(None)] * grid.ndim
        sl[axis] = slice(t, t + n)
        out = out + wt * p[tuple(sl)]
    return out


def bilateral_process(luminance, sigma_s: float, sigma_r: float, detail: float,
                      _force_general: bool = False,
                      _use_pallas_blur: bool | None = None,
                      _use_fused_kernel: bool = False,
                      _use_band_kernel: bool | None = None,
                      _pallas_interpret: bool = False):
    """Detail boost on an (H, W) luminance plane (BilateralImpl::process,
    bilateral.cu:358-385).

    Returns the processed (H, W) luminance.
    """
    lum = jnp.asarray(luminance, dtype=_F32)
    if lum.ndim != 2:
        raise RuntimeError(
            f'luminance must be a 2-D (H, W) plane, got shape {tuple(lum.shape)}'
        )
    h, w = lum.shape
    gx, gy, gz = compute_grid_size(w, h, sigma_s, sigma_r)

    # Integer-sigma fast path: when sigma_s is an integer dividing the image
    # (the shipped configs: sigma_s = 2 or 8 on even geometries) the splat
    # windows are strided slices and the slice reads are repeats - no XLA
    # gathers, which are slow on TPU.
    s_int = int(sigma_s)
    fast = (
        not _force_general
        and float(sigma_s) == s_int
        and s_int >= 1
        and w % s_int == 0
        and h % s_int == 0
        and gx == w // s_int + 1
        and gy == h // s_int + 1
    )

    if fast and _bilateral_fused is not None:
        # Fully-fused Pallas chain (kernels/bilateral_fused.py).  OFF by
        # default: measured 32.8 vs 14.9 ms at 12MP sigma_s=2 - the ~200
        # pltpu.roll shifts per band are VPU-bound on this chip and cost
        # more than the XLA chain's HBM round trips.  Kept as an explicit
        # opt-in (_use_fused_kernel=True) and a negative-result template;
        # outputs agree to float rounding (6e-8).  _pallas_interpret only
        # selects interpret-mode for whichever path is otherwise active.
        if _use_fused_kernel:
            wg = w // s_int
            for bg in (64, 32, 16, 8):
                vmem = 4 * (2 * gz * 3 * bg * (wg + 16)
                            + s_int * s_int * 3 * bg * wg)
                if vmem < 48 * 1024 * 1024 or bg == 8:
                    break
            l_diff = _bilateral_fused(
                lum, s=s_int, gz=gz, sigma_r=float(sigma_r),
                z_mode='derivative', bg=bg, interpret=_pallas_interpret)
            norm = -detail * sigma_r * 4.0
            return jnp.maximum(0.0, lum + norm * l_diff)

    if fast and _bilateral_band is not None:
        # Band-resident fused kernel, generation 2 (kernels/bilateral_band.py):
        # columns phase-decomposed XLA-side, rows resampled in-kernel on
        # sublanes, ~6 lane shifts per z slab.  Measured 5.97 vs 12.61 ms at
        # 12MP sigma_s=2 (bg=64), float-rounding equal to the XLA chain
        # (1.2e-7).  Auto = TPU backend + >= 4MP (fresh Mosaic compile ~70 s
        # per shape; the persistent cache makes reloads fast).  Override with
        # TD_BILATERAL_PALLAS=1/0 or _use_band_kernel.
        use_band = _use_band_kernel
        if use_band is None:
            import os
            env = os.environ.get('TD_BILATERAL_PALLAS')
            if env in ('0', '1'):
                use_band = env == '1'
            else:
                use_band = (jax.default_backend() == 'tpu'
                            and h * w >= 4_000_000
                            and not _pallas_interpret)
        if use_band:
            for bg in (64, 32, 16, 8):
                if _bilateral_band_vmem_ok(s_int, gz, w, bg):
                    break
            ph = _bilateral_band(
                lum, s=s_int, gz=gz, sigma_r=float(sigma_r),
                z_mode='derivative', bg=bg, interpret=_pallas_interpret)
            l_diff = _riffle_phases(ph, w)
            norm = -detail * sigma_r * 4.0
            return jnp.maximum(0.0, lum + norm * l_diff)

    if not fast:
        idx_x, wgt_x, tail_x = _axis_splat_operator(w, gx, sigma_s)
        idx_y, wgt_y, tail_y = _axis_splat_operator(h, gy, sigma_s)
        jidx_x, jwgt_x = jnp.asarray(idx_x), jnp.asarray(wgt_x)
        jidx_y, jwgt_y = jnp.asarray(idx_y), jnp.asarray(wgt_y)

    # Per-pixel z coordinates (data dependent).
    g_z = jnp.clip(lum / sigma_r, 0.0, gz - 1)

    contrib = jnp.float32(1.0 / (sigma_s * sigma_s))

    def _splat_axis_fast(img, axis, n_cells):
        """Tent splat along `axis` via s_int strided slices, summed with
        zero-extension (concat) rather than .at scatter updates."""
        img = jnp.moveaxis(img, axis, -1)
        lead = img.shape[:-1]

        def _ext(v, lo):
            k = v.shape[-1]
            parts = []
            if lo:
                parts.append(jnp.zeros(lead + (lo,), dtype=_F32))
            parts.append(v)
            hi = n_cells - lo - k
            if hi:
                parts.append(jnp.zeros(lead + (hi,), dtype=_F32))
            return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else v

        out = 0.0
        for m in range(s_int):
            sl = img[..., m::s_int]
            f = m / s_int
            out = out + _ext(sl * (1.0 - f), 0)
            if f > 0.0:
                out = out + _ext(sl * f, 1)
        return jnp.moveaxis(out, -1, axis)

    def xy_splat(img):
        """Apply the separable spatial splat to an (H, W) map -> (gy, gx)."""
        if fast:
            sx = _splat_axis_fast(img, 1, gx)
            return _splat_axis_fast(sx, 0, gy)
        return _xy_splat_windowed(img, h, w, gx, gy,
                                  jidx_x, jwgt_x, tail_x,
                                  jidx_y, jwgt_y, tail_y)

    # Build the grid one z slab at a time: grid[z] = XYsplat(tent_z * 1/ss^2).
    slabs = []
    for z in range(gz):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z - z))
        slabs.append(xy_splat(wz * contrib))
    grid = jnp.stack(slabs, axis=0)  # (gz, gy, gx)

    # Blur x, then y (gaussian), then z (derivative) - bilateral.cu:370-376.
    grid = _blur_xyz(grid, 'derivative', use_pallas=_use_pallas_blur,
                     interpret=_pallas_interpret)

    # Slice: trilinear read of the blurred-derivative grid (bilateral.cu:208-228).
    ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
    frac_z = g_z - ib_z.astype(_F32)

    if fast:
        frac_col = jnp.tile(
            jnp.arange(s_int, dtype=_F32) / s_int, w // s_int
        )
        frac_row = jnp.tile(jnp.arange(s_int, dtype=_F32) / s_int, h // s_int)

        def xy_slice(slab):
            r0 = jnp.repeat(slab[:-1, :], s_int, axis=0)
            r1 = jnp.repeat(slab[1:, :], s_int, axis=0)
            ry = r0 * (1.0 - frac_row)[:, None] + r1 * frac_row[:, None]
            c0 = jnp.repeat(ry[:, :-1], s_int, axis=1)
            c1 = jnp.repeat(ry[:, 1:], s_int, axis=1)
            return c0 * (1.0 - frac_col)[None, :] + c1 * frac_col[None, :]

    else:
        ib_x, frac_x = _axis_slice_weights(w, gx, sigma_s)
        ib_y, frac_y = _axis_slice_weights(h, gy, sigma_s)
        jib_x, jfrac_x = jnp.asarray(ib_x), jnp.asarray(frac_x)
        jib_y, jfrac_y = jnp.asarray(ib_y), jnp.asarray(frac_y)

        def xy_slice(slab):
            """Bilinear-sample a (gy, gx) slab at every pixel -> (H, W)."""
            r0 = slab[jib_y, :]
            r1 = slab[jib_y + 1, :]
            ry = r0 * (1.0 - jfrac_y)[:, None] + r1 * jfrac_y[:, None]
            c0 = ry[:, jib_x]
            c1 = ry[:, jib_x + 1]
            return c0 * (1.0 - jfrac_x)[None, :] + c1 * jfrac_x[None, :]

    l_diff = jnp.zeros((h, w), dtype=_F32)
    for z in range(gz):
        wz = jnp.where(
            ib_z == z, 1.0 - frac_z, jnp.where(ib_z + 1 == z, frac_z, 0.0)
        )
        l_diff = l_diff + wz * xy_slice(grid[z])

    norm = -detail * sigma_r * 4.0
    return jnp.maximum(0.0, lum + norm * l_diff)


def bilateral_denoise(luminance, sigma_s: float, sigma_r: float, amount: float):
    """Bilateral-grid denoise: weighted-average slice from num/den grids.

    Rebuild of the reference's (unused but present) denoise variant
    (splat_num_kernel bilateral.cu:115-128, slice_denoise_kernel :231-248)
    with Gaussian blurs over all three grid axes.
    """
    lum = jnp.asarray(luminance, dtype=_F32)
    h, w = lum.shape
    gx, gy, gz = compute_grid_size(w, h, sigma_s, sigma_r)

    idx_x, wgt_x, tail_x = _axis_splat_operator(w, gx, sigma_s)
    idx_y, wgt_y, tail_y = _axis_splat_operator(h, gy, sigma_s)
    jidx_x, jwgt_x = jnp.asarray(idx_x), jnp.asarray(wgt_x)
    jidx_y, jwgt_y = jnp.asarray(idx_y), jnp.asarray(wgt_y)

    g_z = jnp.clip(lum / sigma_r, 0.0, gz - 1)
    contrib = jnp.float32(1.0 / (sigma_s * sigma_s))

    def xy_splat(img):
        return _xy_splat_windowed(img, h, w, gx, gy,
                                  jidx_x, jwgt_x, tail_x,
                                  jidx_y, jwgt_y, tail_y)

    num_slabs, den_slabs = [], []
    for z in range(gz):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z - z)) * contrib
        num_slabs.append(xy_splat(wz * lum))
        den_slabs.append(xy_splat(wz))
    grid_num = jnp.stack(num_slabs, axis=0)
    grid_den = jnp.stack(den_slabs, axis=0)

    grid_num = _blur_xyz(grid_num, 'gaussian', use_pallas=None)
    grid_den = _blur_xyz(grid_den, 'gaussian', use_pallas=None)

    ib_x, frac_x = _axis_slice_weights(w, gx, sigma_s)
    ib_y, frac_y = _axis_slice_weights(h, gy, sigma_s)
    jib_x, jfrac_x = jnp.asarray(ib_x), jnp.asarray(frac_x)
    jib_y, jfrac_y = jnp.asarray(ib_y), jnp.asarray(frac_y)
    ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
    frac_z = g_z - ib_z.astype(_F32)

    def xy_slice(slab):
        r0 = slab[jib_y, :]
        r1 = slab[jib_y + 1, :]
        ry = r0 * (1.0 - jfrac_y)[:, None] + r1 * jfrac_y[:, None]
        c0 = ry[:, jib_x]
        c1 = ry[:, jib_x + 1]
        return c0 * (1.0 - jfrac_x)[None, :] + c1 * jfrac_x[None, :]

    num = jnp.zeros((h, w), dtype=_F32)
    den = jnp.zeros((h, w), dtype=_F32)
    for z in range(gz):
        wz = jnp.where(ib_z == z, 1.0 - frac_z, jnp.where(ib_z + 1 == z, frac_z, 0.0))
        num = num + wz * xy_slice(grid_num[z])
        den = den + wz * xy_slice(grid_den[z])

    denoised = jnp.where(den > 1e-8, num / jnp.where(den > 1e-8, den, 1.0), lum)
    return (1.0 - amount) * lum + amount * denoised


__all__ = ['bilateral_denoise', 'bilateral_process', 'compute_grid_size']
