"""Fused color-smoothing: N sequential 3x3 median passes in one kernel.

The XLA formulation (ops/postprocess.py color_smoothing_pass) runs each
median pass as its own HBM round trip - a stencil consumer cannot fuse into
a stencil producer - so N=3 passes over two diff planes move ~576 MB at
12MP.  This kernel keeps a row band in VMEM and cascades all N passes,
cutting traffic to one read + one write of the diff planes.

Semantics match postprocess.cu:24-78 / ops/postprocess.py exactly:
- each pass medians shifted (C - G) differences with ZERO fill outside the
  image (fresh zero fill every pass - enforced by re-zeroing out-of-image
  positions after each pass),
- every pixel is medianed (no interior mask),
- per pass C' = max(median + G, 0), G' = max(G, 0) (G clamps once).
On diff planes with gc = max(g_raw, 0) this is the recurrence
    d_1 = max(med9(d_0) + g_raw, 0) - gc
    d_k = max(med9(d_{k-1}) + gc, 0) - gc        (k >= 2)
and the caller reconstructs C = d_N + gc exactly (d_N = max(..., 0) - gc).

Layout: the two diff planes stack to (2, Hp, Wp) with bh zero rows of top
pad and n_passes zero columns per side; a bh-row center view plus two THIN
halo views (ceil(n_passes/8)*8 rows - the cascade's actual row reach) of
the same array provide the band's neighborhood without re-DMA-ing full
neighbor blocks.  Every in-kernel op is a static sublane/lane slice,
min/max, or select - no lane reshapes (Mosaic cannot lower those).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops._stencil import median9


def _kernel(d_prev, d_cur, d_next, g_prev, g_cur, g_next, o_ref,
            *, bh: int, halo: int, h: int, w: int, n_passes: int):
    """One (bh, W) output band of diffs through all n_passes.

    d_prev/d_next (and g_prev/g_next) are THIN halo blocks of `halo` rows
    each - the cascade's row reach is only n_passes, so DMA-ing full
    bh-row neighbor blocks (the v1 three-view layout) tripled the input
    traffic of this HBM-bound kernel for rows it never read.
    """
    n = n_passes
    i = pl.program_id(1)
    d = jnp.concatenate([d_prev[0], d_cur[0], d_next[0]], axis=0)
    g_raw = jnp.concatenate([g_prev[:], g_cur[:], g_next[:]], axis=0)
    gc = jnp.maximum(g_raw, 0.0)
    row0_true = i * bh - halo  # true image row of concat row 0

    # d covers concat rows [lo, hi) and true cols [-c, W + c)
    lo, c = 0, n
    for p in range(1, n + 1):
        lo_p = halo - (n - p)
        c_p = n - p
        n_rows = bh + 2 * (n - p)
        width = w + 2 * c_p

        r_base = lo_p - lo - 1  # local input row of (output row 0) - 1
        win = [
            d[r_base + dy : r_base + dy + n_rows, dx : dx + width]
            for dy in range(3)
            for dx in range(3)
        ]
        med = median9(win)

        g_r = lo_p  # g arrays stay at full concat geometry
        g_c = n - c_p
        g_center = (g_raw if p == 1 else gc)[g_r : g_r + n_rows, g_c : g_c + width]
        gc_center = gc[g_r : g_r + n_rows, g_c : g_c + width]
        d_new = jnp.maximum(med + g_center, 0.0) - gc_center

        # fresh zero fill for the next pass: zero everything off-image
        rows_t = jax.lax.broadcasted_iota(jnp.int32, d_new.shape, 0) + (
            row0_true + lo_p
        )
        cols_t = jax.lax.broadcasted_iota(jnp.int32, d_new.shape, 1) - c_p
        inside = (rows_t >= 0) & (rows_t < h) & (cols_t >= 0) & (cols_t < w)
        d = jnp.where(inside, d_new, 0.0)
        lo, c = lo_p, c_p

    o_ref[0] = d  # rows [bh, 2bh), cols [0, w) exactly


@functools.partial(jax.jit, static_argnames=('n_passes', 'bh', 'interpret'))
def color_smooth_diffs(diffs, g, *, n_passes: int, bh: int = 32,
                       interpret: bool = False):
    """Run n_passes fused median passes over stacked diff planes.

    Args:
        diffs: (2, H, W) float32 (R-G, B-G) difference planes (raw g).
        g: (H, W) float32 raw green plane.
        n_passes: number of median passes (1..bh).
        bh: output band height (block row count).

    Returns:
        (2, H, W) float32 diff planes after all passes, where the final
        channel value is diffs_out + max(g, 0).
    """
    _, h, w = diffs.shape
    if not 1 <= n_passes <= bh:
        raise ValueError(f'n_passes must be in [1, {bh}], got {n_passes}')
    n_rb = -(-h // bh)
    hp = (n_rb + 2) * bh
    wp = w + 2 * n_passes

    # Thin halo blocks: the cascade reaches n_passes rows past the band,
    # so the neighbor views only need ceil(n/8)*8 rows (sublane-aligned),
    # not full bh-row blocks (which tripled this kernel's input DMA).
    # Block indexing needs bh % halo == 0; degenerate to full blocks
    # otherwise (only reachable at extreme n_passes).
    halo = -(-n_passes // 8) * 8
    if bh % halo:
        halo = bh
    q = bh // halo

    dp = jnp.pad(
        diffs.astype(jnp.float32),
        ((0, 0), (bh, hp - h - bh), (n_passes, n_passes)),
    )
    gp = jnp.pad(
        g.astype(jnp.float32), ((bh, hp - h - bh), (n_passes, n_passes))
    )

    kernel = functools.partial(_kernel, bh=bh, halo=halo, h=h, w=w,
                               n_passes=n_passes)
    # prev: last `halo` rows of band i-1 (pixel rows [i*bh - halo, i*bh),
    # shifted +bh by the top pad); next: first `halo` rows of band i+1.
    d_specs = [
        pl.BlockSpec((1, halo, wp), lambda ci, i: (ci, (i + 1) * q - 1, 0)),
        pl.BlockSpec((1, bh, wp), lambda ci, i: (ci, i + 1, 0)),
        pl.BlockSpec((1, halo, wp), lambda ci, i: (ci, (i + 2) * q, 0)),
    ]
    g_specs = [
        pl.BlockSpec((halo, wp), lambda ci, i: ((i + 1) * q - 1, 0)),
        pl.BlockSpec((bh, wp), lambda ci, i: (i + 1, 0)),
        pl.BlockSpec((halo, wp), lambda ci, i: ((i + 2) * q, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(2, n_rb),
        in_specs=[*d_specs, *g_specs],
        out_specs=pl.BlockSpec((1, bh, w), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, n_rb * bh, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(dp, dp, dp, gp, gp, gp)
    return out[:, :h]


__all__ = ['color_smooth_diffs']
