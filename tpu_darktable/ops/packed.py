"""Packed 12-bit RAW codec (standard and IDS byte layouts).

TPU-native rebuild of the reference CUDA codec (csrc/packed.cu:8-31 for the
pair layouts, :34-155 for the kernels).  Two 12-bit pixels pack into three
bytes:

  standard:  b0 = p0 & 0xff;  b1 = (p1 & 0xf) << 4 | p0 >> 8;  b2 = p1 >> 4
  IDS:       b0 = p0 >> 4;    b1 = p1 >> 4;  b2 = (p0 & 0xf) << 4 | (p1 & 0xf)

Implemented as pure jax.numpy integer ops on int32 lanes (TPU has no fast
sub-32-bit ALU paths; XLA fuses the unpack into whatever consumes it, so the
decode is free when jitted into the pipeline).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bayer import PackedFormat


def _decode12_pairs(packed, ids_format: bool):
    """uint8 (..., 3N) -> two int32 arrays (..., N) of 12-bit values."""
    packed = jnp.asarray(packed)
    if packed.shape[-1] % 3 != 0:
        raise ValueError(f'packed length must be multiple of 3, got {packed.shape[-1]}')
    # Stride-3 lane slices, NOT a (..., N, 3) reshape: a minor axis of 3
    # pads to the 128-lane tile (21x memory expansion - OOMs large batches)
    # while strided slices keep the minor dimension wide.
    b0 = packed[..., 0::3].astype(jnp.int32)
    b1 = packed[..., 1::3].astype(jnp.int32)
    b2 = packed[..., 2::3].astype(jnp.int32)
    if ids_format:
        p0 = (b0 << 4) | (b2 & 0xF)
        p1 = (b1 << 4) | (b2 >> 4)
    else:
        p0 = ((b1 & 0xF) << 8) | b0
        p1 = (b2 << 4) | (b1 >> 4)
    return p0, p1


def _interleave_pairs(p0, p1):
    """(..., N), (..., N) -> (..., 2N) interleaved."""
    return jnp.stack((p0, p1), axis=-1).reshape(p0.shape[:-1] + (2 * p0.shape[-1],))


def _encode12_values(values_int32, ids_format: bool):
    """int32 (..., 2N) of 12-bit values -> uint8 (..., 3N)."""
    v = values_int32
    if v.shape[-1] % 2 != 0:
        raise ValueError(f'input length must be even, got {v.shape[-1]}')
    pairs = v.reshape(v.shape[:-1] + (-1, 2))
    p0, p1 = pairs[..., 0], pairs[..., 1]
    if ids_format:
        b0 = p0 >> 4
        b1 = p1 >> 4
        b2 = ((p0 & 0xF) << 4) | (p1 & 0xF)
    else:
        b0 = p0 & 0xFF
        b1 = ((p1 & 0xF) << 4) | (p0 >> 8)
        b2 = p1 >> 4
    triples = jnp.stack((b0, b1, b2), axis=-1)
    return triples.reshape(v.shape[:-1] + (3 * (v.shape[-1] // 2),)).astype(jnp.uint8)


def decode12_float(packed, ids_format: bool = False, scaled: bool = True):
    """uint8 packed -> float32 values, scaled by 1/4095 when `scaled`.

    Mirrors csrc/packed.cu:87-108 / :207-236.  Operates on the trailing axis;
    callers decoding images should reshape bytes to (..., H, 3*W/2) first so
    the byte arithmetic runs on a wide minor dimension (TPU layout sweet
    spot - about 2x faster than a flat decode at 12 MP).
    """
    p0, p1 = _decode12_pairs(packed, ids_format)
    out = _interleave_pairs(p0, p1).astype(jnp.float32)
    if scaled:
        out = out * jnp.float32(1.0 / 4095.0)
    return out


def decode12_half(packed, ids_format: bool = False, scaled: bool = True):
    """uint8 packed -> float16 values (csrc/packed.cu:111-132)."""
    return decode12_float(packed, ids_format, scaled).astype(jnp.float16)


def decode12_u16(packed, ids_format: bool = False):
    """uint8 packed -> uint16 12-bit values (csrc/packed.cu:135-155)."""
    p0, p1 = _decode12_pairs(packed, ids_format)
    return _interleave_pairs(p0, p1).astype(jnp.uint16)


def encode12_u16(values, ids_format: bool = False):
    """uint16 values -> packed uint8; clamps to 12 bits (csrc/packed.cu:34-57)."""
    v = jnp.minimum(jnp.asarray(values).astype(jnp.int32), 4095)
    return _encode12_values(v, ids_format)


def encode12_float(values, ids_format: bool = False, scaled: bool = True):
    """float32 values -> packed uint8; scale 4095, round, clamp (csrc/packed.cu:60-84)."""
    v = jnp.asarray(values, dtype=jnp.float32)
    scale = jnp.float32(4095.0 if scaled else 1.0)
    q = jnp.round(v * scale).astype(jnp.int32)
    # Reference computes min(uint16(roundf(f)), 4095): negative floats wrap in
    # uint16 conversion; we clamp at zero instead (sane behaviour, same result
    # for in-range inputs).
    q = jnp.clip(q, 0, 4095)
    return _encode12_values(q, ids_format)


def encode(image, format_type: PackedFormat = PackedFormat.Packed12, dtype=None):
    """Dtype-dispatching encode (reference debayer.py:119-141)."""
    image = jnp.asarray(image)
    ids = format_type is PackedFormat.Packed12_IDS
    if image.dtype == jnp.uint16:
        return encode12_u16(image, ids_format=ids)
    if image.dtype == jnp.float32:
        return encode12_float(image, ids_format=ids)
    raise ValueError(f'Unsupported input dtype: {image.dtype}')


def decode12(packed, output_dtype=jnp.float32, format_type: PackedFormat = PackedFormat.Packed12):
    """Dtype-dispatching decode (reference debayer.py:144-168)."""
    ids = format_type is PackedFormat.Packed12_IDS
    output_dtype = jnp.dtype(output_dtype)
    if output_dtype == jnp.float32:
        return decode12_float(packed, ids_format=ids)
    if output_dtype == jnp.float16:
        return decode12_half(packed, ids_format=ids)
    if output_dtype == jnp.uint16:
        return decode12_u16(packed, ids_format=ids)
    raise ValueError(f'Unsupported output dtype: {output_dtype}')


__all__ = [
    'decode12',
    'decode12_float',
    'decode12_half',
    'decode12_u16',
    'encode',
    'encode12_float',
    'encode12_u16',
]
