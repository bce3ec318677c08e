#!/usr/bin/env python
"""Root-cause probe for the BENCH_r03 FULL reload failure (VERDICT r3 item 1c).

Builds the exact FULL bench program (bench.py:_bench_child), then either:
  lower   - print sha256 of the lowered StableHLO text (run in two fresh
            processes: differing hashes = nondeterministic cache key)
  compile - time .compile() with persistent-cache hit/miss logging enabled
  run     - full reload-to-first-result timing (compile + warmup execution)

Usage: python experiments/reload_probe.py {lower|compile|run}
"""

import hashlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'lower'

    import numpy as np
    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))

    def note(msg):
        print(f'[probe] {time.strftime("%H:%M:%S")} +{time.perf_counter() - T0:7.2f}s {msg}',
              file=sys.stderr, flush=True)

    T0 = time.perf_counter()
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
    args = (data, wb, bounds, metrics, alpha)
    note(f'inputs ready (platform={jax.devices()[0].platform}, batch={batch})')

    lowered = fn.lower(*args)
    note('lowered')
    text = lowered.as_text()
    h = hashlib.sha256(text.encode()).hexdigest()
    print(f'[probe] stablehlo sha256 = {h}  ({len(text)} chars)', flush=True)
    if mode == 'lower':
        # Dump for cross-process diffing.
        out = f'/tmp/probe_hlo_{os.getpid()}.txt'
        with open(out, 'w') as f:
            f.write(text)
        print(f'[probe] dumped to {out}', flush=True)
        return

    note('compiling (persistent cache logging on)')
    compiled = lowered.compile()
    note('compile returned')
    if mode == 'run':
        out, b, m = fn(*args)
        np.asarray(m)
        note('first execution fenced')
        t0 = time.perf_counter()
        out, b, m = fn(*args)
        np.asarray(m)
        note(f'second execution fenced ({time.perf_counter() - t0:.2f}s for batch {batch})')


if __name__ == '__main__':
    main()
