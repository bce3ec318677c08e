"""Bayer-channel histogram rendering with saturation stats
(mirror of reference view_raw/histogram_display.py:66-115)."""

from __future__ import annotations

import numpy as np

from ..bayer_utils import extract_bayer_channels
from tpu_darktable.ops.bayer import BayerPattern

_COLORS = {'R': 'tab:red', 'G1': 'tab:green', 'G2': 'darkgreen', 'B': 'tab:blue'}


def draw_histograms(ax, bayer_image, pattern: BayerPattern, bins: int = 128,
                    saturation: float = 0.99, log_scale: bool = True):
    """Draw per-channel histograms onto a matplotlib axis; returns the
    per-channel saturation percentages."""
    channels = extract_bayer_channels(bayer_image, pattern)
    ax.clear()
    sat = {}
    for name, vals in channels.items():
        if vals.size == 0:
            continue
        hist, edges = np.histogram(vals, bins=bins, range=(0.0, 1.0))
        centers = 0.5 * (edges[:-1] + edges[1:])
        ax.plot(centers, hist, color=_COLORS[name], label=name, linewidth=1.0)
        sat[name] = 100.0 * float((vals >= saturation).mean())
    if log_scale:
        ax.set_yscale('log')
    ax.set_xlim(0.0, 1.0)
    ax.legend(
        [f'{n}: {sat.get(n, 0.0):.2f}% sat' for n in channels],
        loc='upper right', fontsize=8,
    )
    ax.set_title('Bayer channel histograms')
    return sat
