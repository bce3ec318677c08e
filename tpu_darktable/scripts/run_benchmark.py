"""Per-op benchmark CLI (mirror of reference scripts/run_benchmark.py).

Measures iterations/sec per op after warmup, the reference's protocol
(run_benchmark.py:16-39) adapted to TPU: ops chain on-device inside one jit
(lax.scan) because per-dispatch tunnel latency would otherwise dominate, and
completion is fenced through a scalar readback (block_until_ready does not
synchronize on all TPU transports).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.ops import (
    bilateral as _bl,
    demosaic as _dm,
    postprocess as _pp,
    rcd as _rcd,
    wiener as _wn,
    laplacian as _lap,
    color as _cl,
)
from tpu_darktable.ops.bayer import BayerPattern
from .util import load_image


def benchmark(name: str, fn, x0, warmup_iters: int = 2, bench_iters: int = 10) -> float:
    """Time `fn` chained `bench_iters` times on device inside one jit."""
    fence = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    def chained(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=bench_iters)
        return out

    f = jax.jit(chained)
    for _ in range(warmup_iters):
        out = f(x0)
    float(fence(out))

    t0 = time.perf_counter()
    out = f(x0)
    float(fence(out))
    elapsed = time.perf_counter() - t0
    rate = bench_iters / elapsed
    print(f'{name}: {bench_iters} iterations in {elapsed * 1e3:.1f}ms at {rate:.1f} iters/sec')
    return rate


def run_benchmark(
    image_path: Path | None,
    pattern: BayerPattern,
    warmup_iters: int = 2,
    bench_iters: int = 10,
    jpeg_quality: int = 90,
    size: tuple[int, int] = (4096, 3000),
):
    if image_path is not None:
        rgb_tensor = load_image(image_path)
        bayer_input = td.rgb_to_bayer(rgb_tensor, pattern)
    else:
        w, h = size
        rng = np.random.default_rng(0)
        rgb_tensor = jnp.asarray((rng.random((h, w, 3)) * 0.8).astype(np.float32))
        bayer_input = td.rgb_to_bayer(rgb_tensor, pattern)

    height, width = bayer_input.shape[:2]
    print()
    print('=== Benchmark Settings ===')
    print(f'Image size: {width}x{height}')
    print(f'Warmup iterations: {warmup_iters}')
    print(f'Benchmark iterations: {bench_iters}')
    print(f'Pattern: {pattern.name}')
    print()

    bayer2d = bayer_input[..., 0]
    mono = _cl.compute_luminance(rgb_tensor)

    print('=== Denoise Benchmarks ===')
    benchmark('Wiener 32x2', lambda x: _wn.wiener_denoise(x, 0.05, 32, 2), rgb_tensor,
              warmup_iters, bench_iters)
    benchmark('Wiener 32x4', lambda x: _wn.wiener_denoise(x, 0.05, 32, 4), rgb_tensor,
              warmup_iters, bench_iters)
    benchmark('Wiener 32x2 Gray',
              lambda x: _cl.modify_luminance(
                  x, _wn.wiener_denoise(_cl.compute_luminance(x)[..., None], 0.05, 32, 2)[..., 0]),
              rgb_tensor, warmup_iters, bench_iters)
    benchmark('Estimate Noise', lambda x: x * (1e-9 * jnp.sum(_wn.estimate_channel_noise(x)) + 1.0),
              rgb_tensor, warmup_iters, bench_iters)

    print()
    print('=== Demosaic Algorithm Benchmarks ===')
    benchmark('PPG', lambda x: _dm.ppg_demosaic(x, pattern)[..., 1], bayer2d,
              warmup_iters, bench_iters)
    benchmark('RCD', lambda x: _rcd.rcd_demosaic(x, pattern)[..., 1], bayer2d,
              warmup_iters, bench_iters)
    benchmark('Bilinear 5x5', lambda x: _dm.bilinear5x5_demosaic(x, pattern)[..., 1], bayer2d,
              warmup_iters, bench_iters)

    print()
    print('=== Post-processing Benchmarks ===')
    benchmark('Color smooth', lambda x: _pp.postprocess(x, pattern, 3, False, False), rgb_tensor,
              warmup_iters, bench_iters)
    benchmark('Green eq', lambda x: _pp.postprocess(x, pattern, 0, True, True), rgb_tensor,
              warmup_iters, bench_iters)

    print()
    print('=== Laplacian/Bilateral Benchmarks ===')
    benchmark('Laplacian', lambda x: _lap.local_laplacian(x, _lap.LaplacianParams()), mono,
              warmup_iters, max(2, bench_iters // 2))
    benchmark('Bilateral 2x2', lambda x: _bl.bilateral_process(x, 2.0, 0.2, 0.2), mono,
              warmup_iters, bench_iters)
    benchmark('Bilateral 8x1', lambda x: _bl.bilateral_process(x, 8.0, 0.1, 0.2), mono,
              warmup_iters, bench_iters)

    print()
    print('=== JPEG Encoding Benchmarks ===')
    u8 = np.asarray(jnp.clip(rgb_tensor * 255.0, 0, 255).astype(jnp.uint8))
    jpeg = td.Jpeg()

    def bench_host(name, fn, iters=5):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        rate = iters / (time.perf_counter() - t0)
        print(f'{name}: {iters} iterations at {rate:.2f} iters/sec')

    bench_host(f'JPEG Encode (Q{jpeg_quality})',
               lambda: jpeg.encode(u8, quality=jpeg_quality, input_format=td.InputFormat.RGBI))
    print()


def main():
    parser = argparse.ArgumentParser(description='Benchmark demosaic algorithms and post-processing')
    parser.add_argument('image', type=Path, nargs='?', default=None,
                        help='Input image path (default: synthetic 4096x3000)')
    parser.add_argument('--pattern', type=str, default='RGGB',
                        choices=[p.name for p in BayerPattern])
    parser.add_argument('--warmup-iters', type=int, default=2)
    parser.add_argument('--bench-iters', type=int, default=10)
    parser.add_argument('--jpeg-quality', type=int, default=90)
    parser.add_argument('--width', type=int, default=4096)
    parser.add_argument('--height', type=int, default=3000)
    args = parser.parse_args()

    run_benchmark(
        args.image,
        BayerPattern[args.pattern],
        args.warmup_iters,
        args.bench_iters,
        args.jpeg_quality,
        (args.width, args.height),
    )


if __name__ == '__main__':
    main()
