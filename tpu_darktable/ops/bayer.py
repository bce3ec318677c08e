"""Bayer CFA pattern types and mosaic utilities.

TPU-native re-design of the reference's Bayer handling
(reference: torch_darktable/bayer.py, csrc/debayer/bayer_device.h:9-44,
csrc/debayer/demosaic.h:7-12).  The reference encodes the CFA in darktable's
32-bit "filters" words and decodes per-pixel channel codes on the fly with a
bit-twiddle (`fc()`).  Here the pattern compiles to *static* 2x2 numpy masks
that XLA folds into constants, so per-pixel channel dispatch becomes masked
vector selects instead of data-dependent branching.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path

import numpy as np
import jax.numpy as jnp


class BayerPattern(Enum):
    """darktable 32-bit CFA "filters" words (csrc/debayer/demosaic.h:7-12)."""

    RGGB = 0x94949494
    BGGR = 0x16161616
    GRBG = 0x61616161
    GBRG = 0x49494949


class PackedFormat(Enum):
    """12-bit packed RAW byte layouts (reference: torch_darktable/bayer.py:19-21)."""

    Packed12 = 0
    Packed12_IDS = 1


def fc(row, col, pattern: BayerPattern) -> int:
    """Channel code (0=R, 1=G, 2=B, 3=G2) at (row, col).

    Bit-twiddle lookup into the pattern word, identical to the reference's
    `fc()` device helper (csrc/debayer/bayer_device.h:9-11).  Works on python
    ints and numpy arrays.
    """
    return (pattern.value >> ((((row << 1) & 14) + (col & 1)) << 1)) & 3


def fc_tile(pattern: BayerPattern) -> np.ndarray:
    """Static 2x2 tile of channel codes for the pattern."""
    return np.array(
        [[fc(r, c, pattern) for c in range(2)] for r in range(2)], dtype=np.int32
    )


def fc_map(height: int, width: int, pattern: BayerPattern) -> np.ndarray:
    """(H, W) numpy int32 map of channel codes.  Static - feed to jnp as a constant."""
    tile = fc_tile(pattern)
    reps = ((height + 1) // 2, (width + 1) // 2)
    return np.tile(tile, reps)[:height, :width]


def channel_masks(height: int, width: int, pattern: BayerPattern) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(is_red, is_green, is_blue) static boolean maps (green covers both sites)."""
    codes = fc_map(height, width, pattern)
    return codes == 0, (codes == 1) | (codes == 3), codes == 2


def pixel_order(pattern: BayerPattern) -> tuple[int, int, int, int]:
    """Pixel-type (R, G1, G2, B) order of the 2x2 cell sites (reference bayer.py:70-83)."""
    match pattern:
        case BayerPattern.RGGB:
            return (0, 1, 2, 3)
        case BayerPattern.BGGR:
            return (3, 1, 2, 0)
        case BayerPattern.GRBG:
            return (1, 0, 3, 2)
        case BayerPattern.GBRG:
            return (1, 3, 0, 2)
    raise ValueError(f'Invalid bayer pattern: {pattern}')


def channels(pattern: BayerPattern) -> tuple[int, int, int, int]:
    """RGB channel index sampled at each 2x2 cell site (reference bayer.py:86-95)."""
    match pattern:
        case BayerPattern.RGGB:
            return (0, 1, 1, 2)
        case BayerPattern.BGGR:
            return (2, 1, 1, 0)
        case BayerPattern.GRBG:
            return (1, 0, 1, 2)
        case BayerPattern.GBRG:
            return (1, 2, 1, 0)
    raise ValueError(f'Invalid bayer pattern: {pattern}')


def rgb_to_bayer(rgb, pattern: BayerPattern = BayerPattern.RGGB):
    """Mosaic an (H, W, 3) RGB image into an (H, W, 1) Bayer image.

    Mirrors reference bayer.py:25-47 (test-data synthesis).
    """
    rgb = jnp.asarray(rgb)
    c1, c2, c3, c4 = channels(pattern)
    stacked = jnp.stack(
        (
            rgb[0::2, 0::2, c1],
            rgb[0::2, 1::2, c2],
            rgb[1::2, 0::2, c3],
            rgb[1::2, 1::2, c4],
        ),
        axis=-1,
    )
    return expand_bayer(stacked)


def stack_bayer(bayer_image):
    """(H, W) Bayer -> (H/2, W/2, 4) planes in cell order (reference bayer.py:98-108)."""
    bayer_image = jnp.asarray(bayer_image)
    return jnp.stack(
        (
            bayer_image[0::2, 0::2],
            bayer_image[0::2, 1::2],
            bayer_image[1::2, 0::2],
            bayer_image[1::2, 1::2],
        ),
        axis=-1,
    )


def expand_bayer(x):
    """(H/2, W/2, 4) planes -> (H, W, 1) Bayer (reference bayer.py:111-120)."""
    x = jnp.asarray(x)
    h, w = x.shape[0], x.shape[1]
    r, g1, g2, b = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    result = jnp.zeros((h * 2, w * 2), dtype=x.dtype)
    result = result.at[0::2, 0::2].set(r)
    result = result.at[0::2, 1::2].set(g1)
    result = result.at[1::2, 0::2].set(g2)
    result = result.at[1::2, 1::2].set(b)
    return result[..., None]


def load_as_bayer(image_path: Path, pattern: BayerPattern = BayerPattern.RGGB):
    """Load an RGB image file and mosaic it to (H, W, 1) Bayer in [0, 1].

    Mirrors reference bayer.py:51-67 but uses PIL (no cv2 dependency required).
    """
    image_path = Path(image_path)
    if not image_path.exists():
        raise FileNotFoundError(f'Image not found: {image_path}')
    from PIL import Image

    image = np.asarray(Image.open(image_path).convert('RGB'), dtype=np.float32) / 255.0
    return rgb_to_bayer(jnp.asarray(image), pattern)


__all__ = [
    'BayerPattern',
    'PackedFormat',
    'channel_masks',
    'channels',
    'expand_bayer',
    'fc',
    'fc_map',
    'fc_tile',
    'load_as_bayer',
    'pixel_order',
    'rgb_to_bayer',
    'stack_bayer',
]
