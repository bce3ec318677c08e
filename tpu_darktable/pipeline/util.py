"""Small pipeline utilities (mirror of reference pipeline/util.py)."""

from __future__ import annotations

import jax


def lerp(a, b, t: float):
    """a + (b - a) * t (reference util.py:4-5)."""
    return a + (b - a) * t


def normalize_image(rgb_raw, bounds):
    """(x - lo) / (hi - lo) (reference util.py:8-10)."""
    return (rgb_raw - bounds[0]) / (bounds[1] - bounds[0])


def resize(image, size: tuple[int, int]):
    """Bilinear resize of (H, W, C) to size=(h, w) (reference util.py:13-17).

    jax.image.resize with linear interpolation matches torch's
    align_corners=False bilinear semantics.
    """
    h, w = size
    return jax.image.resize(image, (h, w, image.shape[2]), method='linear')


def resize_longest_edge(size: tuple[int, int], longest: int) -> tuple[int, int]:
    """(w, h) scaled so the longest edge is `longest` (reference util.py:27-34)."""
    if longest == 0:
        return size
    if size[0] > size[1]:
        return (longest, size[1] * longest // size[0])
    return (size[0] * longest // size[1], longest)


def resize_image(image, longest: int):
    h, w = image.shape[:2]
    tw, th = resize_longest_edge((w, h), longest)
    return resize(image, (th, tw))
