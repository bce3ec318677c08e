"""On-device JPEG entropy coding: byte-identity vs the native C++ scan.

The device path (ops/jpeg_entropy.py) must produce the exact bytes of
native/bitpack.cpp's jpeg_encode_baseline_rst for the same restart
interval — Huffman codes, ZRL folding, EOB placement, byte-align padding,
0xFF stuffing and RSTn markers included.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.native import jpeg_encode_baseline_native, get_lib
from tpu_darktable.ops.jpeg import _HUFF, _jpeg_device_stage, quality_to_tables
from tpu_darktable.ops import jpeg_entropy as je

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason='native library unavailable (oracle needed)')


def _tables():
    return (
        (_HUFF[('dc', 0)][0], _HUFF[('dc', 0)][1],
         _HUFF[('ac', 0)][0], _HUFF[('ac', 0)][1]),
        (_HUFF[('dc', 1)][0], _HUFF[('dc', 1)][1],
         _HUFF[('ac', 1)][0], _HUFF[('ac', 1)][1]),
    )


def _blocks_for(rng, h, w, subsampling, quality=90):
    """Realistic quantized blocks: smooth image + noise through the real
    device stage."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 90 * np.sin(xx / 23) * np.cos(yy / 17),
        128 + 70 * np.cos(xx / 11),
        128 + 50 * np.sin((xx + yy) / 31),
    ], -1)
    img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)
    qy, qc = quality_to_tables(quality)
    cbs = _jpeg_device_stage(
        jnp.asarray(img), jnp.asarray(qy, jnp.float32),
        jnp.asarray(qc, jnp.float32), subsampling=subsampling, swap_br=False)
    return [np.asarray(cb) for cb in cbs]


def _native_body(comp_blocks, subsampling, restart_interval):
    return jpeg_encode_baseline_native(
        comp_blocks, subsampling, _tables(), restart_interval=restart_interval)


@pytest.mark.parametrize('subsampling', [0, 1, 2])
@pytest.mark.parametrize('restart_interval', [0, 5, 16])
def test_device_entropy_matches_native(rng, subsampling, restart_interval):
    comp_blocks = _blocks_for(rng, 48, 80, subsampling)
    ref = _native_body(comp_blocks, subsampling, restart_interval)
    got = je.entropy_encode_device(comp_blocks, subsampling, restart_interval)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


def test_device_entropy_extreme_coefficients(rng):
    """Hand-built blocks hitting ZRL folding (runs of 16/32/48 zeros),
    all-zero AC, EOB-less blocks (nonzero at position 63), and large
    magnitudes (10-bit sizes)."""
    blocks = np.zeros((8, 64), dtype=np.int16)
    blocks[0, 0] = 500
    blocks[1, 0] = -500                      # big negative DC swing
    blocks[1, 63] = 3                        # no EOB
    blocks[2, 0] = 0                         # all-zero AC -> immediate EOB
    blocks[3, 1] = 1
    blocks[3, 18] = -1                       # run of 16 -> 1 ZRL
    blocks[4, 1] = 2
    blocks[4, 34] = -7                       # run of 32 -> 2 ZRLs
    blocks[5, 1] = 1
    blocks[5, 50] = 1023                     # run of 48 -> 3 ZRLs, size 10
    blocks[6, 2] = -1023
    blocks[7, 63] = -1                       # lone last coefficient
    for ri in (0, 3):
        ref = _native_body([blocks], 2, ri)
        got = je.entropy_encode_device([blocks], 2, ri)
        assert got is not None, ri
        np.testing.assert_array_equal(got, ref)


def test_device_entropy_random_blocks(rng):
    """Adversarial random coefficients (dense, large) across 444 MCUs."""
    ny = 12
    mk = lambda n: (rng.integers(-80, 80, (n, 64)) *
                    (rng.random((n, 64)) < 0.25)).astype(np.int16)
    comp_blocks = [mk(ny), mk(ny), mk(ny)]
    for ri in (0, 4):
        ref = _native_body(comp_blocks, 0, ri)
        got = je.entropy_encode_device(comp_blocks, 0, ri,
                                       cap_bytes_per_interval=1 << 16)
        assert got is not None
        np.testing.assert_array_equal(got, ref)


def test_device_entropy_overflow_returns_none(rng):
    """A tiny capacity must be detected, not silently truncated."""
    comp_blocks = _blocks_for(rng, 48, 80, 2)
    got = je.entropy_encode_device(comp_blocks, 2, 4,
                                   cap_bytes_per_interval=8)
    assert got is None


def test_full_encode_device_entropy_matches_host(rng):
    """encode_jpeg(entropy='device') == encode_jpeg(entropy='host'),
    whole-file byte identity, for 422 and GRAY, with and without restarts."""
    from tpu_darktable.ops.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:56, 0:72].astype(np.float32)
    img = np.clip(
        np.stack([120 + 80 * np.sin(xx / 13), 128 + 60 * np.cos(yy / 9),
                  128 + 40 * np.sin((xx - yy) / 21)], -1)
        + rng.normal(0, 5, (56, 72, 3)), 0, 255).astype(np.uint8)
    # Covering pairs: every subsampling and every restart mode appears
    # (the full 3x3 product re-tests the same jitted stages 9x for no
    # added coverage - each combo is a fresh multi-second XLA compile).
    for subsampling, ri in ((0, None), (1, 0), (2, 7)):
        host = encode_jpeg(img, quality=88, subsampling=subsampling,
                           restart_interval=ri, entropy='host')
        dev = encode_jpeg(img, quality=88, subsampling=subsampling,
                          restart_interval=ri, entropy='device')
        np.testing.assert_array_equal(dev, host)


def test_entropy_param_validated_with_progressive(rng):
    """Invalid `entropy` raises even on the progressive path, and the
    explicit device request is rejected there (the progressive scan
    scripts are host-side) instead of being silently ignored."""
    from tpu_darktable.ops.jpeg import JpegException, encode_jpeg

    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    with pytest.raises(JpegException):
        encode_jpeg(img, progressive=True, entropy='devcie')
    with pytest.raises(JpegException):
        encode_jpeg(img, progressive=True, entropy='device')
    assert encode_jpeg(img, progressive=True, entropy='host') is not None
