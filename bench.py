#!/usr/bin/env python
"""Benchmark: full fused ISP pipeline, 12MP RAW -> sRGB frames/sec on one chip.

Measures the flagship path (decode12 -> WB -> RCD -> postprocess -> Wiener ->
bilateral -> metrics -> adaptive tonemap -> uint8) as ONE jitted XLA program,
the BASELINE.json north-star configuration.  Prints one JSON line.

Env knobs: TD_BENCH_BATCH (default 16), TD_BENCH_ITERS (default 5),
TD_BENCH_W/TD_BENCH_H (default 4096x3000).

Note: on the axon TPU tunnel, block_until_ready() does not synchronize;
completion is fenced by materializing the small metrics output of the same
executable.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    iters = int(os.environ.get('TD_BENCH_ITERS', '5'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))

    settings = ImageProcessingSettings(
        debayer=Debayer.rcd,
        postprocess=True,
        enable_denoise=True,
        enable_bilateral=True,
        tone_mapping=ToneMapper.adaptive_aces,
        tone_gamma=1.5,
        tone_intensity=2.0,
        light_adapt=0.8,
        vibrance=0.5,
    )
    fn = jax.jit(
        build_pipeline_fn(
            settings, (width, height), td.BayerPattern.RGGB, td.PackedFormat.Packed12, True
        )
    )

    n_bytes = height * width * 3 // 2
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], dtype=jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    # warmup / compile
    out, b, m = fn(data, wb, bounds, metrics, alpha)
    np.asarray(m)  # fence

    t0 = time.perf_counter()
    for _ in range(iters):
        out, b, m = fn(data, wb, bounds, metrics, alpha)
        np.asarray(m)  # fence: same executable, tiny transfer
    dt = (time.perf_counter() - t0) / (iters * batch)

    fps = 1.0 / dt
    mp = width * height / 1e6
    result = {
        'metric': f'{mp:.0f}MP RAW->sRGB frames/sec (fused ISP: WB+RCD+postprocess+'
                  'Wiener+bilateral+adaptive-ACES, single chip)',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        # BASELINE.json target: >= 2000 fps on a v5e-8; the metric is
        # frames/sec/CHIP, so the per-chip baseline is 2000 / 8 = 250.
        'vs_baseline': round(fps / 250.0, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    sys.exit(main())
