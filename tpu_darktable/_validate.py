"""Uniform argument validation for the public op surface.

The reference runs beartype + TORCH_CHECK shape/device guards on every
public function (e.g. denoise.py:26-32, rcd.cu:602-606), so bad inputs
fail with actionable messages.  Here the equivalent checks run at trace
time (shapes/dtypes are static under jit, so guards cost nothing at
runtime) and raise the same kinds of errors: ValueError for domain
violations, RuntimeError for shape mismatches — instead of letting jax
surface a cryptic tracer/broadcast error deep inside a fused program.

All helpers accept tracers: they only touch `.shape` / `.dtype` / `.ndim`.
"""

from __future__ import annotations

import jax.numpy as jnp


def check_channels_last(x, name: str, channels: int = 3):
    """Require a trailing axis of exactly `channels` (any leading dims)."""
    if x.ndim < 1 or x.shape[-1] != channels:
        raise RuntimeError(
            f'{name} must have a trailing axis of {channels} channels, '
            f'got shape {tuple(x.shape)}'
        )
    return x


def check_rank(x, name: str, *ranks: int):
    if x.ndim not in ranks:
        expected = ' or '.join(str(r) for r in ranks)
        raise RuntimeError(
            f'{name} must have {expected} dimensions, got shape {tuple(x.shape)}'
        )
    return x


def check_shape(x, name: str, shape: tuple):
    """Require an exact shape; None entries match any size."""
    actual = tuple(x.shape)
    ok = len(actual) == len(shape) and all(
        want is None or have == want for have, want in zip(actual, shape)
    )
    if not ok:
        raise RuntimeError(f'{name} must have shape {shape}, got {actual}')
    return x


def check_dtype(x, name: str, *dtypes):
    if x.dtype not in {jnp.dtype(d) for d in dtypes}:
        names = ', '.join(jnp.dtype(d).name for d in dtypes)
        raise RuntimeError(f'{name} must have dtype {names}, got {x.dtype}')
    return x


def as_float_image(x, name: str, channels: int | None = 3):
    """Convert to a jnp array and validate an image-like float input."""
    x = jnp.asarray(x)
    if channels is not None:
        check_channels_last(x, name, channels)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise RuntimeError(f'{name} must be floating point, got {x.dtype}')
    return x


def as_mosaic(x, name: str, dtype=None):
    """Validate a Bayer mosaic: (H, W) or (H, W, 1) -> (H, W) array."""
    x = jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype=dtype)
    if x.ndim == 3:
        if x.shape[-1] != 1:
            raise RuntimeError(
                f'{name} must be a single-channel mosaic (H, W) or (H, W, 1), '
                f'got shape {tuple(x.shape)}'
            )
        x = x[..., 0]
    if x.ndim != 2:
        raise RuntimeError(
            f'{name} must be a single-channel mosaic (H, W) or (H, W, 1), '
            f'got shape {tuple(x.shape)}'
        )
    return x


__all__ = [
    'as_float_image',
    'as_mosaic',
    'check_channels_last',
    'check_dtype',
    'check_rank',
    'check_shape',
]
