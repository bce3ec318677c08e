"""Fused non-local-means: the whole search-window loop in VMEM.

The XLA formulation (ops/nlm.py nlm_denoise) iterates the (2r+1)^2 search
offsets with a fori_loop; every iteration round-trips the full image
(shift, squared diff, box filter, exp, two accumulations) through HBM -
~49 full-image passes at search_radius 3.  This kernel holds a row band
and its accumulators in VMEM and unrolls the offset loop per band: one
read of the (edge-padded) image, one write of the result.

Semantics match ops/nlm.py exactly:
- shifts read the search_radius edge-padded image (provided XLA-side;
  the band halo carries the same values),
- patch distances are squared diffs summed over channels, box-filtered
  with ZERO fill outside the true image (enforced by masking d2 with the
  global row/col iotas before the box sums),
- weight = exp(-dist / (h^2 * n_patch * C)), applied to the shifted image.

Layout: channel-planar (C, Hp, Wp); a bh-row center view plus two thin
halo views (the +-(sr+pr) row reach, sublane-aligned) give the band its
neighborhood; every op is a static slice, elementwise arithmetic, or exp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(inv_h2_ref, x_prev, x_cur, x_next, o_ref,
            *, bh: int, halo: int, h: int, w: int, sr: int, pr: int):
    """One (C, bh, w) output band: all (2sr+1)^2 offsets accumulated.

    x_prev/x_next are THIN `halo`-row neighbor views - the row reach is
    only sr + pr, so full bh-row neighbor blocks tripled the input DMA.
    """
    inv_h2 = inv_h2_ref[0]
    xs = jnp.concatenate([x_prev[:], x_cur[:], x_next[:]], axis=1)
    c = xs.shape[0]
    i = pl.program_id(0)
    row0_true = i * bh - halo  # true image row of concat row 0

    # d2 extent: rows [halo - pr, halo + bh + pr), true cols [-pr, w + pr)
    n_d2 = bh + 2 * pr
    w_d2 = w + 2 * pr
    r_d2 = halo - pr
    c_d2 = sr  # concat col of true col -pr

    x_ctr = xs[:, r_d2 : r_d2 + n_d2, c_d2 : c_d2 + w_d2]

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (n_d2, w_d2), 0) + (
        row0_true + r_d2
    )
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (n_d2, w_d2), 1) - pr
    inside = (rows_t >= 0) & (rows_t < h) & (cols_t >= 0) & (cols_t < w)

    acc = jnp.zeros((c, bh, w), jnp.float32)
    wsum = jnp.zeros((bh, w), jnp.float32)
    n = 2 * sr + 1
    for dy in range(n):
        for dx in range(n):
            # shifted image over the d2 extent and over the output band
            sh_d2 = xs[:, r_d2 + dy - sr : r_d2 + dy - sr + n_d2,
                       c_d2 + dx - sr : c_d2 + dx - sr + w_d2]
            diff = x_ctr - sh_d2
            d2 = jnp.sum(diff * diff, axis=0)
            d2 = jnp.where(inside, d2, 0.0)
            # box filter: (2pr+1)^2 shifts of d2 -> (bh, w)
            dist = 0.0
            for by in range(2 * pr + 1):
                for bx in range(2 * pr + 1):
                    dist = dist + d2[by : by + bh, bx : bx + w]
            wgt = jnp.exp(-dist * inv_h2)
            sh_ctr = sh_d2[:, pr : pr + bh, pr : pr + w]
            acc = acc + wgt[None] * sh_ctr
            wsum = wsum + wgt

    o_ref[:] = acc / wsum[None]


@functools.partial(
    jax.jit, static_argnames=('search_radius', 'patch_radius', 'bh', 'interpret')
)
def nlm_core(planes, inv_h2, *, search_radius: int = 3, patch_radius: int = 1,
             bh: int = 32, interpret: bool = False):
    """Fused NLM over channel-planar data.

    Args:
        planes: (C, H, W) float32 image planes.
        inv_h2: scalar 1 / (h^2 * n_patch * C).

    Returns:
        (C, H, W) float32 denoised planes.
    """
    c, h, w = planes.shape
    sr, pr = search_radius, patch_radius
    m = sr + pr
    if bh < m:
        raise ValueError(f'bh ({bh}) must be >= search+patch radius ({m})')
    n_rb = -(-h // bh)
    hp = (n_rb + 2) * bh

    # edge-pad by m in both dims (edge values only ever read within
    # +-sr of the image, matching ops/nlm.py's edge pad), then zero-fill
    # out to the block-aligned extent
    xe = jnp.pad(planes.astype(jnp.float32), ((0, 0), (m, m), (m, m)),
                 mode='edge')
    xp = jnp.pad(xe, ((0, 0), (bh - m, hp - h - bh - m), (0, 0)))
    wp = w + 2 * m

    halo = max(8, -(-m // 8) * 8)  # thin neighbor views for the +-m reach
    if bh % halo:
        halo = bh
    q = bh // halo
    kernel = functools.partial(_kernel, bh=bh, halo=halo, h=h, w=w, sr=sr,
                               pr=pr)
    views = [
        pl.BlockSpec((c, halo, wp), lambda i: (0, (i + 1) * q - 1, 0)),
        pl.BlockSpec((c, bh, wp), lambda i: (0, i + 1, 0)),
        pl.BlockSpec((c, halo, wp), lambda i: (0, (i + 2) * q, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), *views],
        out_specs=pl.BlockSpec((c, bh, w), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, n_rb * bh, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # 3-channel triple-view blocks at 12MP widths need ~57M scoped
            # VMEM; the default 16M cap is conservative (v5e has 128M).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(inv_h2, jnp.float32).reshape(1), xp, xp, xp)
    return out[:, :h]


__all__ = ['nlm_core']
