"""Probe: does chunking the per-frame lax.map loops raise throughput?

The chip's effective HBM bandwidth rises with working-set size (50 GB/s at
one 48 MB plane vs 285 GB/s at 192 MB - dispatch overhead amortizing,
BASELINE.md).  The fused pipeline runs its heavy stages one frame per loop
iteration (live-memory bound); TD_MAP_CHUNK=k vmaps k frames per iteration.

Run alone on the TPU.  Usage: python experiments/map_chunk_probe.py [chunks...]
Default sweeps 1 2 4 interleaved (3 rounds) on the XLA-only config (the
Pallas kernels would each need a fresh vmapped Mosaic compile; the dominant
Wiener stage is XLA either way).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault('TD_RCD_PALLAS', '0')
os.environ.setdefault('TD_BILATERAL_PALLAS', '0')

import numpy as np
import jax
import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
from tpu_darktable.pipeline import image_processor as ip

B = 16
W, H = 4096, 3000

chunks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]


def build(chunk):
    os.environ['TD_MAP_CHUNK'] = str(chunk)
    s = ImageProcessingSettings(
        debayer=Debayer.rcd, postprocess=True, enable_denoise=True,
        enable_bilateral=True, tone_mapping=ToneMapper.adaptive_aces,
    )
    return jax.jit(ip.build_pipeline_fn(
        s, (W, H), td.BayerPattern.RGGB, td.PackedFormat.Packed12, True))


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 255, (B, H * W * 3 // 2), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    fns = {}
    for c in chunks:
        print(f'compile chunk={c} ...', flush=True)
        fns[c] = build(c)
        out, b2, m2 = fns[c](data, wb, bounds, metrics, alpha)
        float(np.asarray(jnp.sum(m2)))

    # interleaved rounds; discard round 0 (clock-ramp bias, BASELINE.md)
    results = {c: [] for c in chunks}
    for rnd in range(4):
        for c in chunks:
            fn = fns[c]
            t0 = time.perf_counter()
            for _ in range(2):
                out, b2, m2 = fn(data, wb, bounds, metrics, alpha)
            float(np.asarray(jnp.sum(m2)) + np.asarray(out[0, 0, 0, 0]).astype(np.float32))
            ms = (time.perf_counter() - t0) / (2 * B) * 1e3
            results[c].append(ms)
            print(f'round {rnd} chunk={c}: {ms:.1f} ms/frame', flush=True)

    print()
    for c in chunks:
        steady = results[c][1:]
        print(f'chunk={c}: steady {min(steady):.1f}-{max(steady):.1f} ms/frame '
              f'(first {results[c][0]:.1f})')


if __name__ == '__main__':
    main()
