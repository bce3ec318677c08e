"""Shared script helpers (mirror of reference scripts/util.py).

Image display degrades gracefully to file output when no GUI is available
(this framework targets headless TPU hosts).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp


def load_image(image_path: Path):
    """Load an RGB image file -> (H, W, 3) float32 jnp array in [0, 1]."""
    from PIL import Image

    image_path = Path(image_path)
    if not image_path.exists():
        raise FileNotFoundError(f'Image not found: {image_path}')
    arr = np.asarray(Image.open(image_path).convert('RGB'), dtype=np.float32) / 255.0
    return jnp.asarray(arr)


def save_image(image, path: Path):
    """Save a float [0,1] or uint8 (H, W, 3) image."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    Image.fromarray(arr).save(path)


def display_images(named_images: dict, output: Path | None = None, title: str = ''):
    """Show images side by side; headless -> save a comparison PNG.

    Replaces the reference's cv2 windows (scripts/util.py:15-25) with
    matplotlib, falling back to file output without a display.
    """
    import matplotlib

    headless = output is not None or not os.environ.get('DISPLAY')
    if headless:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    n = len(named_images)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 6))
    if n == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, named_images.items()):
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0.0, 1.0)
        ax.imshow(arr)
        ax.set_title(name)
        ax.axis('off')
    fig.suptitle(title)
    fig.tight_layout()
    if headless:
        out = output or Path('comparison.png')
        fig.savefig(out, dpi=100)
        print(f'saved {out}')
    else:
        plt.show()
    plt.close(fig)
