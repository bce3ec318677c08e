"""Shared stencil helpers for the demosaic / postprocess kernels.

The reference implements stencils as CUDA shared-memory tiles
(csrc/debayer/*.cu).  Here each stencil is expressed as statically shifted
slices of a padded array; XLA fuses the resulting elementwise graph into wide
VPU code on TPU, and the same expressions run on CPU for tests.  Masks are
built from broadcasted iota comparisons so no full-resolution constants are
materialized in the executable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pad2d(x, radius: int, mode: str = 'constant'):
    """Pad the last two axes by `radius` (zero or edge)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(radius, radius), (radius, radius)]
    if mode == 'constant':
        return jnp.pad(x, pad, mode='constant', constant_values=0)
    return jnp.pad(x, pad, mode='edge')


class Shifter:
    """Cheap access to integer-shifted views of a 2-D (or ...HW) array.

    `s(dy, dx)[r, c] == x[r + dy, c + dx]` with out-of-range reads giving the
    pad value.  This matches the CUDA tile loads: zero-fill for the PPG/RCD
    shared buffers, clamp-to-edge for bilinear.
    """

    def __init__(self, x, radius: int, mode: str = 'constant'):
        self.h = x.shape[-2]
        self.w = x.shape[-1]
        self.r = radius
        self.p = pad2d(x, radius, mode)

    def __call__(self, dy: int, dx: int):
        r = self.r
        return self.p[..., r + dy : r + dy + self.h, r + dx : r + dx + self.w]


def row_col_iota(h: int, w: int, dtype=jnp.int32):
    rows = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    cols = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return rows, cols


def interior_mask(h: int, w: int, border: int):
    """True for pixels with border <= x < w-border and likewise in y."""
    rows, cols = row_col_iota(h, w)
    return (
        (rows >= border) & (rows < h - border) & (cols >= border) & (cols < w - border)
    )


def parity_mask(h: int, w: int, row_par: int, col_par: int):
    """True at pixels with (row % 2, col % 2) == (row_par, col_par)."""
    rows, cols = row_col_iota(h, w)
    return ((rows & 1) == row_par) & ((cols & 1) == col_par)


def site_masks(h: int, w: int, pattern):
    """Boolean maps for R / G(either) / B sites, plus the fc-code map pieces.

    Built from the pattern's 2x2 fc tile (bayer.fc_tile); every supported
    pattern has one R, one B, and two G sites per cell.
    """
    from .bayer import fc_tile

    tile = fc_tile(pattern)
    masks = {}
    for code, name in ((0, 'r'), (2, 'b')):
        (pr, pc) = np.argwhere(tile == code)[0]
        masks[name] = parity_mask(h, w, int(pr), int(pc))
    masks['g'] = ~(masks['r'] | masks['b'])
    return masks


# Optimal 25-compare-exchange sorting network for 9 elements.  Replaces
# jnp.sort over a stacked axis, which lowers to a genuinely expensive sort on
# TPU (and pathologically slow compiles); a CE network is 25 fused min/max
# pairs on the VPU - the same trick as the reference's sorting networks
# (reduction.h:93-144).
_SORT9_NETWORK = [
    (0, 3), (1, 7), (2, 5), (4, 8),
    (0, 7), (2, 4), (3, 8), (5, 6),
    (0, 2), (1, 3), (4, 5), (7, 8),
    (1, 4), (3, 6), (5, 7),
    (0, 1), (2, 4), (3, 5), (6, 8),
    (2, 3), (4, 5), (6, 7),
    (1, 2), (3, 4), (5, 6),
]


def sort9(values):
    """Sort 9 same-shape arrays elementwise; returns the 9 sorted arrays."""
    v = list(values)
    assert len(v) == 9
    for a, b in _SORT9_NETWORK:
        lo = jnp.minimum(v[a], v[b])
        hi = jnp.maximum(v[a], v[b])
        v[a], v[b] = lo, hi
    return v


def median9(values):
    """Elementwise median of 9 arrays via the CE network."""
    return sort9(values)[4]


def tile2x2_map(h: int, w: int, tile):
    """Expand a (2, 2) numpy array into an (h, w) map via iota selects."""
    tile = np.asarray(tile)
    rows, cols = row_col_iota(h, w)
    rp, cp = rows & 1, cols & 1
    out = jnp.where(
        (rp == 0) & (cp == 0),
        tile[0, 0],
        jnp.where(
            (rp == 0) & (cp == 1),
            tile[0, 1],
            jnp.where((rp == 1) & (cp == 0), tile[1, 0], tile[1, 1]),
        ),
    )
    return out
