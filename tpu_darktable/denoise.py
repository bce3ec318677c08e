"""Public denoise module - mirrors reference torch_darktable/denoise.py."""

from __future__ import annotations

import jax.numpy as jnp

from ._jit import jit_with_static
from .ops import color as _color
from .ops.nlm import nlm_denoise, wavelet_denoise
from .ops.wiener import estimate_channel_noise as _estimate_channel_noise
from .ops.wiener import wiener_denoise as _wiener_denoise


def check_overlap_factor(overlap_factor: int):
    if overlap_factor not in {2, 4, 8}:
        raise ValueError('overlap_factor must be 2, 4, or 8')


class Wiener:
    """High-level Wiener denoiser (reference denoise.py:12-105)."""

    def __init__(
        self,
        device=None,
        image_size: tuple[int, int] | None = None,
        overlap_factor: int = 4,
        tile_size: int = 32,
        *,
        spectral_dtype=None,
        storage_dtype=None,
    ):
        """spectral_dtype/storage_dtype: optional low-precision STORAGE for
        the spectral intermediates (TPU extension beyond the reference API;
        f16 halves the stage's HBM traffic at ~4e-4 extra error - see
        ops/wiener.py).  The pipeline threads ImageProcessingSettings.
        denoise_f16 through here so the fused and piecewise paths agree."""
        if image_size is None and isinstance(device, (tuple, list)):
            device, image_size = None, tuple(device)
        if image_size is None:
            raise TypeError('image_size is required')
        width, height = image_size
        if width <= 0 or height <= 0:
            raise ValueError(f'Image dimensions must be positive, got {width}x{height}')
        check_overlap_factor(overlap_factor)
        if tile_size not in {16, 32}:
            raise ValueError(f'tile_size must be 16 or 32, got {tile_size}')

        self._width, self._height = width, height
        self._overlap_factor = overlap_factor
        self._tile_size = tile_size
        self._fn = jit_with_static(
            _wiener_denoise, tile_size=tile_size, overlap_factor=overlap_factor,
            spectral_dtype=spectral_dtype, storage_dtype=storage_dtype,
        )

    def __repr__(self):
        return (
            f'Wiener({self._width}x{self._height},'
            f'overlap_factor={self._overlap_factor}, tile_size={self._tile_size})'
        )

    @property
    def overlap_factor(self) -> int:
        return self._overlap_factor

    def process(self, image, noise):
        """Wiener-filter an (H, W, C) image, C in {1, 3}; noise is a float or
        a (C,) array (reference denoise.py:69-105)."""
        if image.ndim != 3:
            raise ValueError(f'image must have 3 dimensions, got {image.shape}')
        channels = image.shape[2]
        expected = (self._height, self._width, channels)
        if tuple(image.shape) != expected:
            raise RuntimeError(f'Wiener input shape {image.shape} != expected {expected}')
        if channels not in {1, 3}:
            raise ValueError(f'image channels must be 1 or 3, got {channels}')

        if isinstance(noise, float):
            sigmas = jnp.full((channels,), noise, dtype=jnp.float32)
        else:
            sigmas = jnp.asarray(noise, dtype=jnp.float32)
            if sigmas.shape != (channels,):
                raise ValueError(
                    f'noise tensor must have {channels} elements for {channels}-channel image'
                )
        return self._fn(image, sigmas)

    def process_luminance(self, image, noise):
        """Denoise the LAB-L plane only (reference denoise.py:48-52)."""
        luminance = _color.compute_luminance(image)
        modified = self.process(luminance[..., None], noise)[..., 0]
        return _color.modify_luminance(image, modified)

    def process_log_luminance(self, image, noise, eps: float = 1e-4):
        """Denoise log-luminance (pipeline default, reference denoise.py:54-58)."""
        log_luminance = _color.compute_log_luminance(image, eps=eps)
        modified = self.process(log_luminance[..., None], noise)[..., 0]
        return _color.modify_log_luminance(image, modified, eps=eps)

    def process_log(self, image, noise, eps: float = 1e-4):
        """Denoise all channels in log space (reference denoise.py:60-62)."""
        log_rgb = jnp.log(jnp.asarray(image) + eps)
        return jnp.exp(self.process(log_rgb, noise))


def create_wiener(device=None, image_size=None, *, overlap: int = 4, tile_size: int = 32) -> Wiener:
    """Factory mirror of reference denoise.py:108-127."""
    return Wiener(device, image_size, overlap_factor=overlap, tile_size=tile_size)


estimate_channel_noise = _estimate_channel_noise

__all__ = ['Wiener', 'check_overlap_factor', 'create_wiener', 'estimate_channel_noise',
           'nlm_denoise', 'wavelet_denoise']
