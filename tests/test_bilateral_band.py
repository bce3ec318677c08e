"""Band-resident fused bilateral kernel (kernels/bilateral_band.py) vs the
XLA fast path, interpret mode on CPU.  Same formula, different assembly
order - float rounding only.  Shapes are chosen so n_b > 1 (the band halo
concat and the pad rows are exercised) and so H is not a multiple of the
band (internal padding path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import bilateral as B
from tpu_darktable.kernels.bilateral_band import (
    bilateral_band, bilateral_band_vmem_ok, riffle_phases)


@pytest.mark.parametrize('h,w,s,sr,bg', [
    (96, 128, 2, 0.2, 16),    # 3 bands of 32 rows
    (80, 128, 2, 0.2, 16),    # h not a multiple of the band -> padded tail
    (100, 192, 2, 0.1, 8),    # gz = 11, 7 bands
    (64, 128, 8, 0.2, 4),     # s=8: 2 bands of 32 rows
    (48, 96, 1, 0.2, 16),     # s=1: single-phase degenerate case
])
def test_band_matches_xla_fast_path(h, w, s, sr, bg, rng):
    lum = jnp.asarray((rng.random((h, w)) * 0.95).astype(np.float32))
    ref = np.asarray(B.bilateral_process(
        lum, float(s), sr, 0.4, _use_pallas_blur=False,
        _use_band_kernel=False))
    _, _, gz = B.compute_grid_size(w, h, float(s), sr)
    assert bilateral_band_vmem_ok(s, gz, w, bg)
    ph = bilateral_band(lum, s=s, gz=gz, sigma_r=float(sr), bg=bg,
                        interpret=True)
    ld = riffle_phases(ph, w)
    out = np.asarray(jnp.maximum(0.0, lum + (-0.4 * sr * 4.0) * ld))
    assert np.abs(out - ref).max() < 1e-5


def test_band_via_public_entry(rng):
    """bilateral_process routes through the band kernel when forced on in
    interpret mode; result matches the XLA chain."""
    lum = jnp.asarray((rng.random((96, 128)) * 0.9).astype(np.float32))
    ref = np.asarray(B.bilateral_process(lum, 2.0, 0.2, 0.4,
                                         _use_pallas_blur=False,
                                         _use_band_kernel=False))
    out = np.asarray(B.bilateral_process(lum, 2.0, 0.2, 0.4,
                                         _use_band_kernel=True,
                                         _pallas_interpret=True))
    assert np.abs(out - ref).max() < 1e-5


def test_band_gaussian_z_mode(rng):
    """z_mode='gaussian' (bilateral_denoise semantics) also matches a
    straight-line XLA rebuild of the same formula."""
    h, w, s, sr = 64, 128, 2, 0.2
    lum = jnp.asarray((rng.random((h, w)) * 0.9).astype(np.float32))
    _, _, gz = B.compute_grid_size(w, h, float(s), sr)

    # XLA reference: integer fast-path splat/blur/slice with gaussian z.
    ref_ld = _xla_l_diff(lum, s, sr, gz, 'gaussian')
    ph = bilateral_band(lum, s=s, gz=gz, sigma_r=float(sr),
                        z_mode='gaussian', bg=8, interpret=True)
    ld = np.asarray(riffle_phases(ph, w))
    assert np.abs(ld - ref_ld).max() < 1e-5


def _xla_l_diff(lum, s, sr, gz, z_mode):
    """Straight-line XLA splat/blur/slice (the bilateral_process fast path
    internals, re-expressed) returning l_diff for any z_mode."""
    h, w = lum.shape
    gx, gy = w // s + 1, h // s + 1
    g_z = jnp.clip(lum / sr, 0.0, gz - 1)
    contrib = 1.0 / (s * s)

    def splat_axis(img, axis, n_cells):
        img = jnp.moveaxis(img, axis, -1)
        lead = img.shape[:-1]

        def ext(v, lo):
            parts = []
            if lo:
                parts.append(jnp.zeros(lead + (lo,), jnp.float32))
            parts.append(v)
            hi = n_cells - lo - v.shape[-1]
            if hi:
                parts.append(jnp.zeros(lead + (hi,), jnp.float32))
            return jnp.concatenate(parts, -1) if len(parts) > 1 else v

        out = 0.0
        for m in range(s):
            sl = img[..., m::s]
            f = m / s
            out = out + ext(sl * (1.0 - f), 0)
            if f > 0.0:
                out = out + ext(sl * f, 1)
        return jnp.moveaxis(out, -1, axis)

    slabs = []
    for z in range(gz):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z - z)) * contrib
        slabs.append(splat_axis(splat_axis(wz, 1, gx), 0, gy))
    grid = jnp.stack(slabs, 0)
    grid = B._blur_xyz(grid, z_mode, use_pallas=False)

    ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
    fr_z = g_z - ib_z.astype(jnp.float32)
    fc = jnp.tile(jnp.arange(s, dtype=jnp.float32) / s, w // s)
    fr = jnp.tile(jnp.arange(s, dtype=jnp.float32) / s, h // s)

    def xy_slice(slab):
        r0 = jnp.repeat(slab[:-1, :], s, axis=0)
        r1 = jnp.repeat(slab[1:, :], s, axis=0)
        ry = r0 * (1.0 - fr)[:, None] + r1 * fr[:, None]
        c0 = jnp.repeat(ry[:, :-1], s, axis=1)
        c1 = jnp.repeat(ry[:, 1:], s, axis=1)
        return c0 * (1.0 - fc)[None, :] + c1 * fc[None, :]

    ld = jnp.zeros((h, w), jnp.float32)
    for z in range(gz):
        wz = jnp.where(ib_z == z, 1.0 - fr_z,
                       jnp.where(ib_z + 1 == z, fr_z, 0.0))
        ld = ld + wz * xy_slice(grid[z])
    return np.asarray(ld)


def test_vmem_ok_band_size_selection():
    """Regression for the s=8 scoped-VMEM compile OOM on v5e: Mosaic's
    actual stack runs ~2.6x the buffer-sum estimate (127.12 MB measured at
    s=8/bg=64/gz=11/w=4096 against the 100 MB limit), so the feasibility
    cutoff must reject that geometry at bg=64 and accept the verified
    bg=32, while keeping the measured-good 12MP s=2/bg=64 default."""
    # sigma_s=8, sigma_r=0.1 at 4096x3000 (the run_benchmark 'Bilateral 8x1'
    # case that failed to compile): gz = 11
    assert not bilateral_band_vmem_ok(8, 11, 4096, bg=64)
    assert bilateral_band_vmem_ok(8, 11, 4096, bg=32)  # compiles, 1.2e-7 vs XLA
    # flagship 12MP sigma_s=2 sigma_r=0.2 (gz = 8): bg=64 measured good
    assert bilateral_band_vmem_ok(2, 8, 4096, bg=64)
