"""Visual demosaic test CLI (mirror of reference scripts/test_debayer.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.ops.bayer import BayerPattern
from .util import display_images, load_image


def main():
    parser = argparse.ArgumentParser(description='Test debayer algorithms')
    parser.add_argument('image', type=Path, help='Input image path')
    parser.add_argument('--algorithm', choices=['bilinear', 'ppg', 'rcd'], default='rcd')
    parser.add_argument('--pattern', type=str, default='RGGB',
                        choices=[p.name for p in BayerPattern])
    parser.add_argument('--median-threshold', type=float, default=0.0)
    parser.add_argument('--output', type=Path, default=None, help='Save comparison instead of showing')
    args = parser.parse_args()

    pattern = BayerPattern[args.pattern]
    rgb = load_image(args.image)
    bayer = td.rgb_to_bayer(rgb, pattern)
    h, w = bayer.shape[:2]

    if args.algorithm == 'bilinear':
        out = td.bilinear5x5_demosaic(bayer, pattern)
    elif args.algorithm == 'ppg':
        out = td.PPG(None, (w, h), pattern, median_threshold=args.median_threshold).process(bayer)
    else:
        out = td.RCD(None, (w, h), pattern).process(bayer)

    out = jnp.clip(out, 0.0, 1.0)
    display_images({'original': rgb, f'{args.algorithm} demosaic': out},
                   output=args.output, title=f'{args.algorithm} ({pattern.name})')


if __name__ == '__main__':
    main()
