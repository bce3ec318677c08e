"""Visual local-Laplacian test CLI (mirror of reference scripts/test_laplacian.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

from tpu_darktable.local_contrast import Laplacian, LaplacianParams
from .util import display_images, load_image


def main():
    parser = argparse.ArgumentParser(description='Test local Laplacian filter')
    parser.add_argument('image', type=Path)
    parser.add_argument('--sigma', type=float, default=0.2)
    parser.add_argument('--shadows', type=float, default=1.0)
    parser.add_argument('--highlights', type=float, default=1.0)
    parser.add_argument('--clarity', type=float, default=0.0)
    parser.add_argument('--num-gamma', type=int, default=6)
    parser.add_argument('--output', type=Path, default=None)
    args = parser.parse_args()

    rgb = load_image(args.image)
    h, w = rgb.shape[:2]
    params = LaplacianParams(
        num_gamma=args.num_gamma, sigma=args.sigma, shadows=args.shadows,
        highlights=args.highlights, clarity=args.clarity,
    )
    lap = Laplacian(None, (w, h), params)
    out = lap.process_rgb(rgb)
    display_images({'original': rgb, 'laplacian': out}, output=args.output,
                   title=f'local laplacian (sigma={args.sigma}, clarity={args.clarity})')


if __name__ == '__main__':
    main()
