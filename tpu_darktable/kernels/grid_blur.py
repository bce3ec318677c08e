"""Fused bilateral-grid blur: the x/y/z 5-tap passes in one kernel.

The bilateral stage blurs its (gz, gy, gx) grid three times in sequence
(gaussian x, gaussian y, z-derivative - bilateral.cu:370-376); each XLA
pass is a full HBM round trip of the ~70 MB grid.  This kernel cascades
all three over a VMEM row band: one read + one write of the grid.

Boundary semantics match ops/bilateral.py _blur5 exactly: zero fill
(truncated taps) on every axis - provided XLA-side by 2 zero columns per
side, zero row bands from the padded layout, and an in-kernel zero z pad.

Weights are compile-time constants; everything is static slices and
weighted adds (no lane reshapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_GAUSS = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
W_DERIV = (-2.0 / 16.0, -4.0 / 16.0, 0.0, 4.0 / 16.0, 2.0 / 16.0)


def _kernel(g_prev, g_cur, g_next, o_ref, *, bh: int, halo: int, gx: int,
            wz: tuple):
    # g_prev/g_next are THIN halo views (the row reach is only 2; full
    # bh-row neighbor blocks tripled the kernel's input DMA).
    g = jnp.concatenate(
        [g_prev[:, halo - 2 :], g_cur[:], g_next[:, :2]], axis=1)
    gz, n_rows, _ = g.shape

    # blur x (lanes): inputs carry 2 zero cols per side
    bx = 0.0
    for t, wt in enumerate(W_GAUSS):
        bx = bx + wt * g[:, :, t : t + gx]  # (gz, n_rows, gx)

    # blur y (sublanes): consume the +-2 row halo
    by = 0.0
    for t, wt in enumerate(W_GAUSS):
        by = by + wt * bx[:, t : t + bh]  # (gz, bh, gx)

    # z derivative: zero-fill above/below the stack
    zp = jnp.concatenate(
        [jnp.zeros((2, bh, gx), jnp.float32), by, jnp.zeros((2, bh, gx), jnp.float32)],
        axis=0,
    )
    bz = 0.0
    for t, wt in enumerate(wz):
        if wt == 0.0:
            continue
        bz = bz + wt * zp[t : t + gz]

    o_ref[:] = bz


@functools.partial(jax.jit, static_argnames=('bh', 'z_mode', 'interpret'))
def grid_blur_xyz(grid, *, bh: int = 64, z_mode: str = 'derivative',
                  interpret: bool = False):
    """Gaussian-x, gaussian-y, then z blur (derivative or gaussian) of a
    (gz, gy, gx) grid - one fused pass."""
    gz, gy, gx = grid.shape
    n_rb = -(-gy // bh)
    gyp = (n_rb + 2) * bh

    gp = jnp.pad(grid.astype(jnp.float32), ((0, 0), (bh, gyp - gy - bh), (2, 2)))
    wz = W_DERIV if z_mode == 'derivative' else W_GAUSS
    halo = 8 if bh % 8 == 0 else bh  # row reach is 2; sublane-aligned
    q = bh // halo
    kernel = functools.partial(_kernel, bh=bh, halo=halo, gx=gx, wz=wz)
    views = [
        pl.BlockSpec((gz, halo, gx + 4), lambda i: (0, (i + 1) * q - 1, 0)),
        pl.BlockSpec((gz, bh, gx + 4), lambda i: (0, i + 1, 0)),
        pl.BlockSpec((gz, halo, gx + 4), lambda i: (0, (i + 2) * q, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_rb,),
        in_specs=views,
        out_specs=pl.BlockSpec((gz, bh, gx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((gz, n_rb * bh, gx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # Mosaic's scoped-stack allocation runs ~3.4x the buffer-sum
            # estimate (measured: gz=6/gx=3001/bh=8 estimates 5.2 MB but
            # allocates 17.71 MB, over the 16 MB default limit - the
            # clamped-grid sigma_s=1 case at 12MP).  64 MB covers the
            # 10 MB feasibility cutoff with that factor; v5e has 128 MB.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gp, gp, gp)
    return out[:, :gy]


def grid_blur_vmem_ok(gz: int, gx: int, bh: int = 64) -> bool:
    """VMEM feasibility check for the fused blur.  The 10 MB cutoff pairs
    with the kernel's 64 MB scoped limit: Mosaic's actual stack measures
    ~3.4x this estimate (see grid_blur_xyz)."""
    bytes_live = gz * (3 * bh) * (gx + 4) * 4 * 3  # views + two temporaries
    return bytes_live <= 10 * 2**20


__all__ = ['grid_blur_xyz', 'grid_blur_vmem_ok']
