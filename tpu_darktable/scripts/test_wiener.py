"""Visual Wiener denoise test CLI (mirror of reference scripts/test_wiener.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax.numpy as jnp

import tpu_darktable as td
from .util import display_images, load_image


def main():
    parser = argparse.ArgumentParser(description='Test Wiener denoising')
    parser.add_argument('image', type=Path)
    parser.add_argument('--noise', type=float, default=0.05, help='Added gaussian noise sigma')
    parser.add_argument('--sigma', type=float, default=None,
                        help='Filter noise sigma (default: estimated)')
    parser.add_argument('--tile-size', type=int, default=32, choices=[16, 32])
    parser.add_argument('--overlap', type=int, default=4, choices=[2, 4, 8])
    parser.add_argument('--mode', choices=['rgb', 'luminance', 'log_luminance', 'log'],
                        default='rgb')
    parser.add_argument('--output', type=Path, default=None)
    args = parser.parse_args()

    rgb = load_image(args.image)
    h, w = rgb.shape[:2]
    rng = np.random.default_rng(0)
    noisy = jnp.clip(rgb + jnp.asarray(
        rng.normal(0.0, args.noise, rgb.shape).astype(np.float32)), 0.0, 1.0)

    wiener = td.Wiener(None, (w, h), overlap_factor=args.overlap, tile_size=args.tile_size)
    sigma = args.sigma
    if sigma is None:
        sigma = td.estimate_channel_noise(noisy)
        print('estimated channel noise:', np.asarray(sigma))
        if args.mode != 'rgb':
            sigma = float(np.asarray(sigma).mean())

    if args.mode == 'rgb':
        out = wiener.process(noisy, sigma if not isinstance(sigma, float) else float(sigma))
    elif args.mode == 'luminance':
        out = wiener.process_luminance(noisy, float(sigma))
    elif args.mode == 'log_luminance':
        out = wiener.process_log_luminance(noisy, float(sigma))
    else:
        out = wiener.process_log(noisy, float(sigma))

    display_images({'original': rgb, 'noisy': noisy, 'denoised': out},
                   output=args.output, title=f'wiener {args.tile_size}x{args.overlap} ({args.mode})')


if __name__ == '__main__':
    main()
