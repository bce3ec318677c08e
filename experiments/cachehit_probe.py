#!/usr/bin/env python
"""Intercept the persistent-cache lookup during a real FULL compile.

Monkeypatches jax._src.compilation_cache.get_executable_and_time to print
the cache key and HIT/MISS, and (with TD_PROBE_ABORT=1) aborts on a miss
before the multi-minute compile starts.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from jax._src import compilation_cache as cc
    orig = cc.get_executable_and_time

    def spy(cache_key, *a, **kw):
        t0 = time.perf_counter()
        res = orig(cache_key, *a, **kw)
        hit = res[0] is not None
        print(f'[probe] cache {"HIT" if hit else "MISS"} key={cache_key} '
              f'lookup={time.perf_counter() - t0:.2f}s', file=sys.stderr, flush=True)
        big = 'fused' in str(cache_key)
        if not hit and big and os.environ.get('TD_PROBE_ABORT', '1') == '1':
            print('[probe] aborting before expensive compile', file=sys.stderr, flush=True)
            os._exit(3)
        return res

    cc.get_executable_and_time = spy

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
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

    t0 = time.perf_counter()
    compiled = fn.lower(data, wb, bounds, metrics, alpha).compile()
    print(f'[probe] compile() returned in {time.perf_counter() - t0:.2f}s',
          file=sys.stderr, flush=True)

    if os.environ.get('TD_PROBE_RUN', '0') == '1':
        out, b, m = fn(data, wb, bounds, metrics, alpha)
        np.asarray(m)
        print(f'[probe] first exec fenced at +{time.perf_counter() - t0:.2f}s',
              file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
