"""Fused a-trous wavelet shrinkage: all levels in one kernel.

The XLA formulation (ops/nlm.py wavelet_denoise) runs each level's
separable dilated B3 blur as its own HBM round trip (levels x 2 passes
over the full image).  This kernel cascades every level over a VMEM row
band: one image read, one write.

Semantics match ops/nlm.py exactly, including the per-level EDGE padding
of _atrous_blur: out-of-image positions are re-clamped to the current
level's edge row/column between levels, so dilated taps that reach past
the image read the same values the XLA path's fresh `mode='edge'` pad
provides.

Band geometry: bh must cover the total dependency cone
2 * (2^levels - 1) (30 rows for the default 4 levels), so bh=32 is the
floor for defaults.  Channel-planar layout; grid (C, n_row_bands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _kernel(thr_ref, x_prev, x_cur, x_next, o_ref,
            *, bh: int, h: int, w: int, m: int, levels: int):
    """One (bh, w) band of one channel plane through all levels."""
    i = pl.program_id(1)
    x = jnp.concatenate([x_prev[0], x_cur[0], x_next[0]], axis=0)
    n_rows, wp = x.shape  # (3bh, w + 2m)
    row0_true = i * bh - bh  # true image row of extent row 0

    rows_t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + row0_true
    cols_t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) - m
    above = rows_t < 0
    below = rows_t >= h
    left = cols_t < 0
    right = cols_t >= w

    def edge_fix(v):
        # re-clamp out-of-image positions to the current level's edge
        # row/col values.  The extent rows holding true rows 0 / h-1 are
        # band-dependent, so extract them dynamically (the clip keeps the
        # start legal for bands where the mask is all-false anyway).
        # Masked one-row reductions, not dynamic slices (Mosaic rejects the
        # dynamic_slice primitive on kernel values).  When the band holds
        # no true row 0 / h-1 the rows come out zero, but then the above/
        # below masks are all-false and the value is never used.
        top_row = jnp.sum(jnp.where(rows_t == 0, v, 0.0), axis=0,
                          keepdims=True)
        bot_row = jnp.sum(jnp.where(rows_t == h - 1, v, 0.0), axis=0,
                          keepdims=True)
        v = jnp.where(above, top_row, v)
        v = jnp.where(below, bot_row, v)
        v = jnp.where(left, v[:, m : m + 1], v)
        v = jnp.where(right, v[:, m + w - 1 : m + w], v)
        return v

    current = edge_fix(x)
    residual = jnp.zeros_like(x)
    for lvl in range(levels):
        step = 1 << lvl
        rows = 0.0
        for t in range(5):
            sh = (t - 2) * step
            lo = max(sh, 0)
            hi = min(n_rows + sh, n_rows)
            pad_top = lo - sh
            pad_bot = n_rows - (hi - sh)
            seg = current[lo:hi]
            if pad_top:
                seg = jnp.concatenate(
                    [jnp.broadcast_to(current[0:1], (pad_top, wp)), seg], axis=0
                )
            if pad_bot:
                seg = jnp.concatenate(
                    [seg, jnp.broadcast_to(current[-1:], (pad_bot, wp))], axis=0
                )
            rows = rows + _B3[t] * seg
        smooth = 0.0
        for t in range(5):
            sh = (t - 2) * step
            lo = max(sh, 0)
            hi = min(wp + sh, wp)
            pad_l = lo - sh
            pad_r = wp - (hi - sh)
            seg = rows[:, lo:hi]
            if pad_l:
                seg = jnp.concatenate(
                    [jnp.broadcast_to(rows[:, 0:1], (n_rows, pad_l)), seg], axis=1
                )
            if pad_r:
                seg = jnp.concatenate(
                    [seg, jnp.broadcast_to(rows[:, -1:], (n_rows, pad_r))], axis=1
                )
            smooth = smooth + _B3[t] * seg
        smooth = edge_fix(smooth)
        detail = current - smooth
        thr = thr_ref[pl.program_id(0)] * (0.5 ** lvl)
        detail = jnp.sign(detail) * jnp.maximum(jnp.abs(detail) - thr, 0.0)
        residual = residual + detail
        current = smooth

    out = current + residual
    o_ref[0] = out[bh : 2 * bh, m : m + w]


@functools.partial(
    jax.jit, static_argnames=('levels', 'bh', 'interpret')
)
def wavelet_core(planes, thresholds, *, levels: int = 4, bh: int = 32,
                 interpret: bool = False):
    """Fused a-trous shrinkage over channel-planar data.

    Args:
        planes: (C, H, W) float32.
        thresholds: (C,) base threshold per channel (scale * sigma).

    Returns:
        (C, H, W) float32 denoised planes.
    """
    c, h, w = planes.shape
    m = 2 * ((1 << levels) - 1)
    if bh < m:
        raise ValueError(f'bh ({bh}) must cover the dependency cone ({m})')
    n_rb = -(-h // bh)
    hp = (n_rb + 2) * bh

    xe = jnp.pad(planes.astype(jnp.float32), ((0, 0), (0, 0), (m, m)),
                 mode='edge')
    xp = jnp.pad(xe, ((0, 0), (bh, hp - h - bh), (0, 0)), mode='edge')
    # rows above/below pad with edge too so band-0/band-last halos hold the
    # level-0 edge values (deeper levels re-clamp in-kernel)
    wp = w + 2 * m

    kernel = functools.partial(_kernel, bh=bh, h=h, w=w, m=m, levels=levels)
    views = [
        pl.BlockSpec((1, bh, wp), lambda ci, i, s=s: (ci, i + s, 0))
        for s in range(3)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(c, n_rb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), *views],
        out_specs=pl.BlockSpec((1, bh, w), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, n_rb * bh, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(jnp.asarray(thresholds, jnp.float32).reshape(c), xp, xp, xp)
    return out[:, :h]


__all__ = ['wavelet_core']
