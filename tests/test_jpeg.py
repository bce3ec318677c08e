"""JPEG encoder: decode-PSNR oracle via Pillow (reference test_jpeg.py:39-45)."""

import io

import numpy as np
import pytest
from PIL import Image

from tpu_darktable.ops import jpeg as jpeg_ops


def _test_image(h=96, w=128):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 128 + 100 * np.sin(xx / 9.0)
    g = 128 + 80 * np.cos(yy / 13.0)
    b = 128 + 60 * np.sin((xx + yy) / 17.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize('subsampling', [0, 1])
def test_encode_decodes_and_matches(subsampling):
    img = _test_image()
    data = jpeg_ops.encode_jpeg(img, quality=94, input_format=3, subsampling=subsampling)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('RGB'))
    assert decoded.shape == img.shape
    assert _psnr(img, decoded) > 35.0


def test_gray():
    img = _test_image()
    data = jpeg_ops.encode_jpeg(img, quality=90, input_format=3, subsampling=2)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('L'))
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert _psnr(y, decoded) > 35.0


def test_bgr_formats():
    img = _test_image()
    data = jpeg_ops.encode_jpeg(img[..., ::-1].copy(), quality=94, input_format=2, subsampling=0)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('RGB'))
    assert _psnr(img, decoded) > 35.0


def test_planar_input():
    img = _test_image()
    planar = np.moveaxis(img, -1, 0).copy()
    data = jpeg_ops.encode_jpeg(planar, quality=94, input_format=1, subsampling=0)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('RGB'))
    assert _psnr(img, decoded) > 35.0


def test_quality_affects_size():
    img = _test_image()
    lo = jpeg_ops.encode_jpeg(img, quality=30)
    hi = jpeg_ops.encode_jpeg(img, quality=95)
    assert len(hi) > len(lo)


def test_odd_sizes():
    img = _test_image(h=33, w=47)
    data = jpeg_ops.encode_jpeg(img, quality=90, subsampling=1)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('RGB'))
    assert decoded.shape == img.shape
    assert _psnr(img, decoded) > 30.0


def test_wrapper_class():
    import tpu_darktable as td

    img = _test_image()
    data = td.Jpeg().encode(img, quality=94, input_format=td.InputFormat.RGBI)
    decoded = np.asarray(Image.open(io.BytesIO(np.asarray(data).tobytes())).convert('RGB'))
    assert _psnr(img, decoded) > 35.0


@pytest.mark.parametrize('subsampling', [0, 1, 2])
def test_progressive_encode(subsampling):
    img = _test_image()
    data = jpeg_ops.encode_jpeg(img, quality=94, input_format=3,
                                subsampling=subsampling, progressive=True)
    mode = 'L' if subsampling == 2 else 'RGB'
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert(mode))
    if subsampling == 2:
        y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        assert _psnr(y, decoded) > 35.0
    else:
        assert _psnr(img, decoded) > 35.0


def test_progressive_smaller_than_baseline():
    # optimized Huffman + progressive typically beats the fixed-table baseline
    img = _test_image(160, 160)
    base = jpeg_ops.encode_jpeg(img, quality=94, progressive=False)
    prog = jpeg_ops.encode_jpeg(img, quality=94, progressive=True)
    assert len(prog) < len(base) * 1.1


def test_progressive_blank_image():
    # all-zero AC bands exercise the EOB-run path end to end
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    data = jpeg_ops.encode_jpeg(img, quality=90, progressive=True)
    decoded = np.asarray(Image.open(io.BytesIO(data.tobytes())).convert('RGB'))
    assert _psnr(img, decoded) > 40.0


def test_optimal_huffman_valid():
    from tpu_darktable.ops.jpeg_progressive import build_optimal_huffman

    rng = np.random.default_rng(3)
    freqs = np.zeros(256, dtype=np.int64)
    freqs[rng.integers(0, 256, 40)] = rng.integers(1, 10000, 40)
    bits, vals, codes, lens = build_optimal_huffman(freqs)
    assert sum(bits) == len(vals)
    assert max(bits[i] and i + 1 for i in range(16)) <= 16
    # prefix-free check
    assigned = [(int(codes[v]), int(lens[v])) for v in vals]
    for i, (c1, l1) in enumerate(assigned):
        for c2, l2 in assigned[i + 1:]:
            if l1 <= l2:
                assert (c2 >> (l2 - l1)) != c1
            else:
                assert (c1 >> (l1 - l2)) != c2


@pytest.mark.parametrize('subsampling', [0, 1, 2])
def test_restart_markers_decode_identical(subsampling):
    """Restart-interval scan (thread-parallel C++ path) decodes to the same
    pixels as the serial scan and carries a DRI segment (T.81 B.2.4.4,
    reference nvJPEG per-MCU-row parallelism jpeg_encoder.cu:117-148)."""
    img = _test_image(80, 96)
    base = jpeg_ops.encode_jpeg(img, 90, 3, subsampling, restart_interval=0)
    rst = jpeg_ops.encode_jpeg(img, 90, 3, subsampling, restart_interval=5)
    assert b'\xff\xdd' not in base.tobytes()[:800]
    assert b'\xff\xdd' in rst.tobytes()[:800]
    d0 = np.asarray(Image.open(io.BytesIO(base.tobytes())).convert('RGB'))
    d1 = np.asarray(Image.open(io.BytesIO(rst.tobytes())).convert('RGB'))
    np.testing.assert_array_equal(d0, d1)


def test_restart_thread_count_invariant():
    from tpu_darktable.native import get_lib, jpeg_encode_baseline_native
    from tpu_darktable.ops.jpeg import _HUFF

    if get_lib() is None:
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(11)
    blocks = np.zeros((240, 64), np.int16)
    blocks[:, 0] = rng.integers(-200, 200, 240)
    blocks[rng.integers(0, 240, 900), rng.integers(1, 64, 900)] = \
        rng.integers(-40, 40, 900).astype(np.int16)
    tables = (
        (_HUFF[('dc', 0)][0], _HUFF[('dc', 0)][1],
         _HUFF[('ac', 0)][0], _HUFF[('ac', 0)][1]),
        (_HUFF[('dc', 1)][0], _HUFF[('dc', 1)][1],
         _HUFF[('ac', 1)][0], _HUFF[('ac', 1)][1]),
    )
    outs = [
        jpeg_encode_baseline_native([blocks], 2, tables,
                                    restart_interval=16, n_threads=nt)
        for nt in (1, 2, 5, 0)
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)


def test_restart_auto_threshold():
    """Auto mode stays off for small images (no DRI) and keeps decoding."""
    img = _test_image(64, 64)
    data = jpeg_ops.encode_jpeg(img, 90, 3, 1)  # restart_interval=None (auto)
    assert b'\xff\xdd' not in data.tobytes()[:800]


def test_encode_async_matches_sync_device():
    """encode_jpeg_async (dispatch now, finalize later) must produce the
    exact bytes of the synchronous device-entropy path, including across
    interleaved dispatches (the streaming double-buffer pattern)."""
    imgs = [_test_image(), _test_image(h=64, w=80)[:, ::-1]]
    sync = [jpeg_ops.encode_jpeg(im, quality=90, entropy='device')
            for im in imgs]
    # dispatch both before finalizing either
    handles = [jpeg_ops.encode_jpeg_async(im, quality=90) for im in imgs]
    for h, s in zip(handles, sync):
        np.testing.assert_array_equal(h.result(), s)


def test_encode_async_overflow_host_fallback():
    """A tiny per-interval capacity forces the device-overflow path; the
    PendingJpeg host fallback must still produce a valid bitstream equal to
    the host-entropy encode."""
    from tpu_darktable.ops import jpeg_entropy as je

    img = _test_image()
    host = jpeg_ops.encode_jpeg(img, quality=90, entropy='host')
    pend = jpeg_ops.encode_jpeg_async(img, quality=90)
    # sabotage: replace the pending handles with an overflowing dispatch
    pend._pending = je.entropy_encode_device_dispatch(
        pend._comp_blocks_dev, 1, pend._meta[-1], cap_bytes_per_interval=8)
    np.testing.assert_array_equal(pend.result(), host)


def test_jpeg_wrapper_encode_async():
    from tpu_darktable.jpeg import Jpeg

    img = _test_image()
    got = Jpeg().encode_async(img, quality=92).result()
    ref = Jpeg().encode(img, quality=92, entropy='device')
    np.testing.assert_array_equal(got, ref)
