"""Visual bilateral-grid test CLI (mirror of reference scripts/test_bilateral.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import tpu_darktable as td
from .util import display_images, load_image


def main():
    parser = argparse.ArgumentParser(description='Test bilateral grid local contrast')
    parser.add_argument('image', type=Path)
    parser.add_argument('--sigma-s', type=float, default=2.0)
    parser.add_argument('--sigma-r', type=float, default=0.2)
    parser.add_argument('--detail', type=float, default=0.4)
    parser.add_argument('--log-space', action='store_true')
    parser.add_argument('--output', type=Path, default=None)
    args = parser.parse_args()

    rgb = load_image(args.image)
    h, w = rgb.shape[:2]
    bil = td.Bilateral(None, (w, h), sigma_s=args.sigma_s, sigma_r=args.sigma_r)
    if args.log_space:
        out = bil.process_log_rgb(rgb, args.detail)
    else:
        out = bil.process_rgb(rgb, args.detail)
    display_images({'original': rgb, 'bilateral': out}, output=args.output,
                   title=f'bilateral (sigma_s={args.sigma_s}, sigma_r={args.sigma_r}, detail={args.detail})')


if __name__ == '__main__':
    main()
