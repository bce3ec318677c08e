"""Packed-12 codec: bit-level layout checks + round trips (packed.cu semantics)."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import packed
from tpu_darktable.ops.bayer import PackedFormat


def _encode_pair_std(p0, p1):
    return [p0 & 0xFF, ((p1 & 0xF) << 4) | (p0 >> 8), p1 >> 4]


def _encode_pair_ids(p0, p1):
    return [p0 >> 4, p1 >> 4, ((p0 & 0xF) << 4) | (p1 & 0xF)]


def test_encode_matches_reference_layout(rng):
    vals = rng.integers(0, 4096, size=64).astype(np.uint16)
    for ids, ref_fn in ((False, _encode_pair_std), (True, _encode_pair_ids)):
        got = np.asarray(packed.encode12_u16(jnp.asarray(vals), ids_format=ids))
        expected = []
        for i in range(0, 64, 2):
            expected.extend(ref_fn(int(vals[i]), int(vals[i + 1])))
        np.testing.assert_array_equal(got, np.array(expected, dtype=np.uint8))


def _ids_nibble_swap(vals):
    """The reference's IDS encode and decode disagree on the shared low-nibble
    byte (packed.cu:21-31): a round trip swaps the pair's low nibbles.  We
    are bug-compatible, so the expected round trip applies this swap."""
    pairs = vals.reshape(-1, 2).astype(np.int64)
    p0, p1 = pairs[:, 0], pairs[:, 1]
    q0 = (p0 & ~0xF) | (p1 & 0xF)
    q1 = (p1 & ~0xF) | (p0 & 0xF)
    return np.stack([q0, q1], axis=1).reshape(-1).astype(vals.dtype)


def test_u16_roundtrip(rng):
    vals = rng.integers(0, 4096, size=1024).astype(np.uint16)
    enc = packed.encode12_u16(jnp.asarray(vals), ids_format=False)
    dec = packed.decode12_u16(enc, ids_format=False)
    np.testing.assert_array_equal(np.asarray(dec), vals)


def test_u16_roundtrip_ids_nibble_swap(rng):
    vals = rng.integers(0, 4096, size=1024).astype(np.uint16)
    enc = packed.encode12_u16(jnp.asarray(vals), ids_format=True)
    dec = packed.decode12_u16(enc, ids_format=True)
    np.testing.assert_array_equal(np.asarray(dec), _ids_nibble_swap(vals))


def test_float_roundtrip(rng):
    vals = rng.integers(0, 4096, size=1024).astype(np.float32) / 4095.0
    enc = packed.encode12_float(jnp.asarray(vals), ids_format=False)
    dec = packed.decode12_float(enc, ids_format=False)
    np.testing.assert_allclose(np.asarray(dec), vals, atol=1e-7)


def test_encode_clamps_to_12_bits():
    vals = jnp.asarray(np.array([5000, 4095, 0, 4096], dtype=np.uint16))
    dec = packed.decode12_u16(packed.encode12_u16(vals))
    np.testing.assert_array_equal(np.asarray(dec), [4095, 4095, 0, 4095])


def test_decode_half_dtype():
    enc = packed.encode12_u16(jnp.asarray(np.arange(16, dtype=np.uint16)))
    half = packed.decode12_half(enc)
    assert half.dtype == jnp.float16


def test_dispatch_wrappers(rng):
    vals = rng.integers(0, 4096, size=128).astype(np.uint16)
    enc = packed.encode(jnp.asarray(vals), PackedFormat.Packed12_IDS)
    dec = packed.decode12(enc, output_dtype=jnp.uint16, format_type=PackedFormat.Packed12_IDS)
    np.testing.assert_array_equal(np.asarray(dec), _ids_nibble_swap(vals))


def test_native_host_decoder_matches(rng):
    from tpu_darktable.native import decode12_u16_host

    vals = rng.integers(0, 4096, size=512).astype(np.uint16)
    for ids in (False, True):
        enc = np.asarray(packed.encode12_u16(jnp.asarray(vals), ids_format=ids))
        host = decode12_u16_host(enc, ids_format=ids)
        dev = np.asarray(packed.decode12_u16(jnp.asarray(enc), ids_format=ids))
        np.testing.assert_array_equal(host, dev)


def test_decode_trailing_axis_2d(rng):
    # trailing-axis decode on a 2-D byte layout must equal the flat decode
    vals = rng.integers(0, 4096, size=4096).astype(np.uint16)
    enc = packed.encode12_u16(jnp.asarray(vals), ids_format=False)
    flat = np.asarray(packed.decode12_u16(enc, ids_format=False))
    two_d = np.asarray(packed.decode12_u16(enc.reshape(16, -1), ids_format=False))
    np.testing.assert_array_equal(two_d.reshape(-1), flat)
