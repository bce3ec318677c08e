"""JPEG encode test CLI (mirror of reference scripts/test_jpeg.py).

Validates the bitstream by decoding with Pillow and reporting PSNR - the
same cross-implementation oracle the reference uses (test_jpeg.py:39-45).
"""

from __future__ import annotations

import argparse
import io
from pathlib import Path

import numpy as np

import tpu_darktable as td
from .util import display_images, load_image


def main():
    parser = argparse.ArgumentParser(description='Test JPEG encoding')
    parser.add_argument('image', type=Path)
    parser.add_argument('--quality', type=int, default=94)
    parser.add_argument('--subsampling', choices=['444', '422', 'gray'], default='422')
    parser.add_argument('--save', type=Path, default=None, help='Save the encoded .jpg')
    parser.add_argument('--output', type=Path, default=None)
    args = parser.parse_args()

    rgb = load_image(args.image)
    u8 = (np.asarray(rgb) * 255.0).round().astype(np.uint8)

    sub = {'444': td.Subsampling.CSS_444, '422': td.Subsampling.CSS_422,
           'gray': td.Subsampling.CSS_GRAY}[args.subsampling]
    data = td.Jpeg().encode(u8, quality=args.quality, input_format=td.InputFormat.RGBI,
                            subsampling=sub)
    raw = np.asarray(data).tobytes()
    print(f'encoded {u8.shape[1]}x{u8.shape[0]} -> {len(raw)} bytes '
          f'(quality {args.quality}, {args.subsampling})')

    if args.save:
        Path(args.save).write_bytes(raw)
        print(f'saved {args.save}')

    from PIL import Image

    decoded = np.asarray(Image.open(io.BytesIO(raw)).convert('RGB'))
    mse = np.mean((decoded.astype(np.float64) - u8.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    print(f'decode PSNR: {psnr:.2f} dB')

    display_images({'original': u8, f'jpeg q{args.quality}': decoded},
                   output=args.output, title=f'JPEG (PSNR {psnr:.1f} dB)')


if __name__ == '__main__':
    main()
