"""Spatial (row) sharding of single frames for latency scaling.

The SP/CP analog from SURVEY.md section 2.21: one 12-MP frame is split in
row bands across the mesh and each chip demosaics its band.  The stencil
halo analysis (RCD border ladder reaches 32 px, interior stencils <= 8 px,
the half-grid containment zone <= 8 px) bounds the influence radius at
~48 px, so each shard computes on a *clamped halo window* of the frame:

    window = clip(band_start - halo, 0, H - block)   block = band + 2*halo

A window clamped at the true image edge coincides with the real border, so
the border ladder runs exactly where it should; everywhere else the window
edge artifacts fall outside the cropped band.  No index plumbing, no
special-cased edge shards - the same traced program runs on every chip.

The input is replicated (a 12 MP float frame is ~48 MB - cheap), the output
band-sharded; compute parallelizes n-ways.  RCD runs with
strict_alias=False (see ops/rcd.py) so block decomposition is exact.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.bayer import BayerPattern
from ..ops import demosaic as _demosaic
from ..ops import rcd as _rcd

# Influence radius: border-green ring (32) + stencil reach, rounded up.
DEFAULT_HALO = 64


def spatial_shard_map_demosaic(
    bayer,
    mesh: Mesh,
    pattern: BayerPattern,
    algorithm: str = 'rcd',
    halo: int = DEFAULT_HALO,
    axis_name: str = 'batch',
):
    """Demosaic one (H, W) frame with rows sharded over `axis_name`.

    Returns the (H, W, 3) result, band-sharded over the mesh.  Matches the
    unsharded op exactly (RCD compared against strict_alias=False).
    """
    bayer = jnp.asarray(bayer)
    if bayer.ndim == 3:
        bayer = bayer[..., 0]
    h, w = bayer.shape
    n = mesh.shape[axis_name]
    if h % n:
        raise ValueError(f'height {h} not divisible by {n} shards')
    band = h // n
    if band % 2:
        raise ValueError(f'band height {band} must be even (Bayer alignment)')
    halo = (halo + 1) // 2 * 2  # even halo keeps CFA phase
    block = band + 2 * halo
    if block > h:
        # Frame too small to shard profitably - run unsharded (jitted, same
        # compiled semantics as the sharded path's per-block program).
        return jax.jit(lambda b: _demosaic_one(b, pattern, algorithm))(bayer)

    def shard_fn(x):
        i = jax.lax.axis_index(axis_name)
        start = i * band
        win = jnp.clip(start - halo, 0, h - block)
        blk = jax.lax.dynamic_slice(x, (win, jnp.int32(0)), (block, w))
        out = _demosaic_one(blk, pattern, algorithm)
        off = start - win
        return jax.lax.dynamic_slice(out, (off, jnp.int32(0), jnp.int32(0)), (band, w, 3))

    # jit the whole shard_map: without it, every primitive inside dispatches
    # eagerly (one tiny XLA program each — measured 10-70x slower on CPU).
    fn = jax.jit(shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(),  # replicated frame in
        out_specs=P(axis_name),  # band-sharded RGB out
    ))
    return fn(bayer)


def _demosaic_one(bayer, pattern: BayerPattern, algorithm: str):
    if algorithm == 'rcd':
        return _rcd.rcd_demosaic(bayer, pattern, strict_alias=False,
                                 use_pallas=False)
    if algorithm == 'ppg':
        return _demosaic.ppg_demosaic(bayer, pattern)
    if algorithm == 'bilinear':
        return _demosaic.bilinear5x5_demosaic(bayer, pattern)
    raise ValueError(f'unknown algorithm: {algorithm}')
