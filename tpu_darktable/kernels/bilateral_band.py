"""Band-resident fused bilateral grid: splat -> blur xyz -> slice, one pass.

Second-generation fusion of the bilateral detail stage (the first,
kernels/bilateral_fused.py, is a documented negative result: its s^2
row x column phase decomposition needs ~200 pltpu.roll lane shifts per
band and loses to the XLA chain).  This kernel keeps the roll count near
the structural minimum by splitting the two image axes asymmetrically:

- columns (the TPU lane axis, which Mosaic cannot stride or interleave)
  are phase-decomposed XLA-side into s planes (H, W/s).  The x splat
  then costs ONE lane-boundary op per z slab: accumulate the non-frac
  and frac phase sums A and B elementwise, and form the grid row as
  [A|0] + [0|B] (tent weights are phase constants);
- rows (the sublane axis) stay at pixel resolution and are resampled
  in-kernel with static sublane slices, reshape splits and stack+merge
  interleaves - all cheap on TPU sublanes, no rolls;
- the 5-tap x blur is 4 static lane slices of a zero-padded band, the
  y blur 5 static sublane slices over the band's row halo, and the z
  blur mixes the gz VMEM-resident slabs (zero truncation everywhere =
  the reference's blur_line semantics, bilateral.cu:132-204);
- the slice re-reads the band's luminance phases for the z tent weights
  and emits s column-phase planes of l_diff; the caller riffles them
  back to (H, W) with lane repeats + a phase select (free-ish in XLA).

Lane-shift budget per z slab: 1 (splat) + 4 (x blur) + 1 (slice) = 6 on
grid-width arrays, ~36 per band at gz=6 - ~5x less shift work than the
fused v1, with the row phases eliminated entirely.

Reference semantics: bilateral.cu:56-228 via ops/bilateral.py's integer
fast path (splat/blur/slice equal to float rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

_W_GAUSS = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
_W_DERIV = (-2.0 / 16.0, -4.0 / 16.0, 0.0, 4.0 / 16.0, 2.0 / 16.0)


def _kernel(ph_prev, ph_cur, ph_next, o_ref, *, s: int, bg: int, gz: int,
            halo: int, h: int, wg: int, sigma_r: float, z_mode: str):
    """One band of bg grid rows -> s*bg output pixel rows (phase planes).

    ph_cur: (s, s*bg, wg) column-phase block of the luminance; plane m
    holds lum[:, m::s].  ph_prev/ph_next are THIN `halo`-row neighbor
    views (the row reach is only 3s - full-band neighbor blocks tripled
    the input DMA).  Everything row-wise is sublane work.
    """
    i = pl.program_id(0)
    band = s * bg
    gx = wg + 1
    contrib = 1.0 / float(s * s)

    # Pixel rows needed: [i*band - 3s, i*band + band + 3s).
    ph_t = jnp.concatenate(
        [ph_prev[:, halo - 3 * s :], ph_cur[:], ph_next[:, : 3 * s]],
        axis=1)  # (s, R, wg)
    r_rows = band + 6 * s
    row0 = i * band - 3 * s  # true pixel row of ph_t row 0

    pix_row = jax.lax.broadcasted_iota(jnp.int32, (r_rows, wg), 0) + row0
    row_valid = (pix_row >= 0) & (pix_row < h)

    # Per-phase z coordinates (data dependent), computed once.
    g_z = [jnp.clip(ph_t[m] / sigma_r, 0.0, gz - 1.0) for m in range(s)]

    # ---- splat + x/y blur, one (bg+2, gx) slab per z ----
    slabs = []
    for z in range(gz):
        acc_a = jnp.zeros((r_rows, wg), _F32)
        acc_b = jnp.zeros((r_rows, wg), _F32)
        for m in range(s):
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z[m] - z))
            wz = jnp.where(row_valid, wz, 0.0) * contrib
            f = m / s
            acc_a = acc_a + (1.0 - f) * wz
            if f > 0.0:
                acc_b = acc_b + f * wz
        zc = jnp.zeros((r_rows, 1), _F32)
        # x splat: grid col gc = A[gc] + B[gc-1]  (tent over cells gc, gc+1)
        sx = (jnp.concatenate([acc_a, zc], axis=1)
              + jnp.concatenate([zc, acc_b], axis=1))  # (R, gx)

        # y splat: pixel row s*rp + mr feeds grid rows rp (1-mr/s), rp+1.
        sxp = sx.reshape(bg + 6, s, gx)
        c = sxp[:, 0]
        d = jnp.zeros((bg + 6, gx), _F32)
        for mr in range(1, s):
            f = mr / s
            c = c + (1.0 - f) * sxp[:, mr]
            d = d + f * sxp[:, mr]
        zr = jnp.zeros((1, gx), _F32)
        g_band = c + jnp.concatenate([zr, d[:-1]], axis=0)
        # g_band[k] = grid row (i*bg - 3) + k; rows outside [0, gy) are
        # zero by construction (row_valid mask), giving the blurs their
        # zero-truncation boundary for free.

        # blur x: 5-tap over 2 zero pad lanes each side (static slices)
        gp = jnp.concatenate(
            [jnp.zeros((bg + 6, 2), _F32), g_band,
             jnp.zeros((bg + 6, 2), _F32)], axis=1)
        bx = _W_GAUSS[2] * gp[:, 2 : 2 + gx]
        for t in (0, 1, 3, 4):
            bx = bx + _W_GAUSS[t] * gp[:, t : t + gx]

        # blur y: 5-tap valid conv over the row halo (static sublane slices)
        by = _W_GAUSS[2] * bx[2 : 2 + bg + 2]
        for t in (0, 1, 3, 4):
            by = by + _W_GAUSS[t] * bx[t : t + bg + 2]
        slabs.append(by)  # rows = grid rows [i*bg - 1, i*bg + bg + 1)

    # ---- z blur (zero truncation above/below the stack) ----
    wz_taps = _W_DERIV if z_mode == 'derivative' else _W_GAUSS
    zed = []
    for z in range(gz):
        acc = None
        for t, wt in enumerate(wz_taps):
            zz = z + t - 2
            if wt == 0.0 or zz < 0 or zz >= gz:
                continue
            term = wt * slabs[zz]
            acc = term if acc is None else acc + term
        zed.append(acc if acc is not None else jnp.zeros((bg + 2, gx), _F32))

    # ---- slice: trilinear read back, accumulated per column phase ----
    ib_z, fr_z = [], []
    for m in range(s):
        gzm = g_z[m][3 * s : 3 * s + band]
        ib = jnp.minimum(gzm.astype(jnp.int32), gz - 2)
        fr = gzm - ib.astype(_F32)
        ib_z.append(ib)
        fr_z.append(fr)

    acc_out = [jnp.zeros((band, wg), _F32) for _ in range(s)]
    for z in range(gz):
        slab = zed[z][1 : bg + 2]  # grid rows [i*bg, i*bg + bg] (bg+1 rows)
        # row upsample: pixel row s*rp + mr lerps grid rows rp, rp+1
        r0 = slab[:-1]  # (bg, gx)
        r1 = slab[1:]
        ry_phases = [(1.0 - mr / s) * r0 + (mr / s) * r1 for mr in range(s)]
        if s == 1:
            ry = ry_phases[0]
        else:
            ry = jnp.stack(ry_phases, axis=1).reshape(band, gx)
        c0 = ry[:, :wg]
        c1 = ry[:, 1:]  # one lane shift, shared by all column phases
        for m in range(s):
            f = m / s
            val = (1.0 - f) * c0 + f * c1
            wsel = jnp.where(
                ib_z[m] == z, 1.0 - fr_z[m],
                jnp.where(ib_z[m] + 1 == z, fr_z[m], 0.0))
            acc_out[m] = acc_out[m] + wsel * val

    for m in range(s):
        o_ref[m] = acc_out[m]


@functools.partial(jax.jit, static_argnames=(
    's', 'gz', 'sigma_r', 'z_mode', 'bg', 'interpret'))
def bilateral_band(lum, *, s: int, gz: int, sigma_r: float,
                   z_mode: str = 'derivative', bg: int = 64,
                   interpret: bool = False):
    """Fused splat/blur/slice over row bands (integer sigma_s fast path).

    Args:
        lum: (H, W) float32 luminance, W % s == 0 (H may be anything).
        s: integer sigma_s; grid is (gz, H//s + 1, W//s + 1).
        gz: z cells; sigma_r: z scale; z_mode: 'derivative' | 'gaussian'.
        bg: grid rows per band (s*bg pixel rows).

    Returns:
        (s, H, W//s) column-phase planes of l_diff: plane m holds the
        response at pixels [:, m::s].  Riffle with `riffle_phases`.
    """
    h, w = lum.shape
    if w % s:
        raise ValueError(f'width {w} not divisible by sigma_s {s}')
    wg = w // s
    band = s * bg
    n_b = -(-h // band)
    hp = (n_b + 2) * band

    phases = jnp.stack([lum.astype(_F32)[:, m::s] for m in range(s)], axis=0)
    phases = jnp.pad(phases, ((0, 0), (band, hp - h - band), (0, 0)))

    # Thin halo blocks for the +-3s row reach: the smallest sublane-aligned
    # row count that divides the band (so neighbor views index in whole
    # blocks); full-band views otherwise (unreachable for practical s).
    halo = -(-3 * s // 8) * 8
    while halo < band and band % halo:
        halo += 8
    if halo > band or band % halo:
        halo = band  # degenerate full-band views (tiny/odd bands only)
    q = band // halo

    kernel = functools.partial(
        _kernel, s=s, bg=bg, gz=gz, halo=halo, h=h, wg=wg,
        sigma_r=float(sigma_r), z_mode=z_mode)
    in_specs = [
        pl.BlockSpec((s, halo, wg), lambda i: (0, (i + 1) * q - 1, 0)),
        pl.BlockSpec((s, band, wg), lambda i: (0, i + 1, 0)),
        pl.BlockSpec((s, halo, wg), lambda i: (0, (i + 2) * q, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s, band, wg), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((s, n_b * band, wg), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(phases, phases, phases)
    return out[:, :h]


def riffle_phases(phases, w: int):
    """(s, H, W//s) column phases -> (H, W): out[:, m::s] = phases[m]."""
    s = phases.shape[0]
    if s == 1:
        return phases[0]
    lane = jnp.arange(w, dtype=jnp.int32) % s
    out = None
    for m in range(s):
        term = jnp.where(lane == m, jnp.repeat(phases[m], s, axis=1), 0.0)
        out = term if out is None else out + term
    return out


def bilateral_band_vmem_ok(s: int, gz: int, w: int, bg: int = 64) -> bool:
    """VMEM feasibility check for the band kernel.

    Mosaic's actual scoped-stack allocation runs ~2.6x this buffer-sum
    estimate (measured on v5e: s=8/bg=64/gz=11/w=4096 estimates 49.6 MB but
    allocates 127.12 MB, blowing the 100 MB scoped limit; s=8/bg=32
    estimates 25 MB and compiles+matches XLA to 1.2e-7).  The 30 MB cutoff
    keeps the measured-good defaults (s=2/bg=64 at 12MP estimates 23.7 MB)
    while pushing large-s / large-gz geometries down to smaller bands
    instead of failing the whole compile.
    """
    wg = w // s
    gx = wg + 1
    band = s * bg
    halo = -(-3 * s // 8) * 8  # thin neighbor views (see bilateral_band)
    views = s * (band + 2 * halo) * wg * 4
    slabs = 2 * gz * (bg + 2) * gx * 4  # slabs + zed
    work = (band + 6 * s) * (gx + 4) * 4 * 4
    out = s * band * wg * 4 * 2
    return views + slabs + work + out <= 30 * 2**20


__all__ = ['bilateral_band', 'bilateral_band_vmem_ok', 'riffle_phases']
