"""Pallas TPU kernels for the hot ops.

Fused kernels keep whole per-tile computations in VMEM, eliminating the
intermediate HBM round-trips the XLA-level formulations pay.  Each kernel
has an XLA fallback (the op modules select automatically); CPU test runs use
the XLA paths, and kernel==XLA equality is covered by dedicated tests in
interpret mode.
"""

from .wiener_core import wiener_tile_core

__all__ = ['wiener_tile_core']
