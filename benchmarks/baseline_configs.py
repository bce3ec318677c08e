#!/usr/bin/env python
"""Measure the five BASELINE.json benchmark configs; emits a JSON report.

Configs (BASELINE.json):
  1. bilinear debayer of one 12MP RGGB frame, float32, on CPU
  2. PPG + RCD demosaic with color-smoothing postprocess, batch 8
  3. wavelet + non-local-means denoise on demosaiced RGB, batch 8
  4. local-laplacian + tonemap curves (Reinhard / filmic / ACES)
  5. full fused ISP incl. JPEG, streaming batch 32

Usage: python benchmarks/baseline_configs.py [--small] [--out report.json]
--small shrinks frames for smoke testing.  Timing uses on-device chaining
with scalar fencing (see BASELINE.md environment notes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _bench_chained(fn, x0, iters):
    import jax
    import jax.numpy as jnp

    def chained(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    f = jax.jit(chained)
    out = f(x0)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = f(x0)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def config1_cpu(w, h):
    """Run config 1 in a CPU subprocess (the config demands CPU)."""
    code = f"""
import time, numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import tpu_darktable as td
rng = np.random.default_rng(0)
mosaic = jnp.asarray((rng.random(({h}, {w})) * 0.8).astype(np.float32))
f = jax.jit(lambda x: td.debayer.bilinear5x5_demosaic(x[..., None], td.BayerPattern.RGGB))
out = f(mosaic); np.asarray(out)
t0 = time.perf_counter()
n = 3
for _ in range(n):
    out = f(mosaic)
np.asarray(out)
print((time.perf_counter() - t0) / n)
"""
    r = subprocess.run([sys.executable, '-c', code], capture_output=True, text=True,
                       timeout=600, cwd=Path(__file__).parent.parent)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-500:])
    return float(r.stdout.strip().splitlines()[-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--small', action='store_true')
    parser.add_argument('--out', type=Path, default=None)
    parser.add_argument('--configs', type=str, default='1,2,3,4,5')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.ops import demosaic as dm, rcd as rcd_mod, postprocess as pp
    from tpu_darktable.ops import nlm, wiener as wn, laplacian as lap, tonemap as tm
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    if args.small:
        w, h, b8, b32 = 512, 384, 2, 4
    else:
        w, h, b8, b32 = 4096, 3000, 8, 32

    wanted = {int(c) for c in args.configs.split(',')}
    rng = np.random.default_rng(0)
    report = {'width': w, 'height': h, 'backend': jax.default_backend()}

    if 1 in wanted:
        dt = config1_cpu(w, h)
        report['config1_bilinear_cpu'] = {'seconds_per_frame': dt, 'fps': 1.0 / dt}
        print(f'config 1 (bilinear, CPU): {1 / dt:.2f} fps', flush=True)

    mosaic_b = jnp.asarray((rng.random((b8, h, w)) * 0.8).astype(np.float32))

    if 2 in wanted:
        def demosaic_chain(x):
            def one(m):
                a = dm.ppg_demosaic(m, td.BayerPattern.RGGB)
                a = pp.postprocess(a, td.BayerPattern.RGGB, color_smoothing_passes=3)
                b = rcd_mod.rcd_demosaic(m, td.BayerPattern.RGGB)
                b = pp.postprocess(b, td.BayerPattern.RGGB, color_smoothing_passes=3)
                return (a + b)[..., 1] * 0.5  # feed back one plane for chaining

            return jax.vmap(one)(x)

        dt = _bench_chained(demosaic_chain, mosaic_b, 3) / b8
        report['config2_ppg_rcd_postprocess_b8'] = {'seconds_per_frame': dt, 'fps': 1.0 / dt}
        print(f'config 2 (PPG+RCD+postprocess, batch {b8}): {1 / dt:.2f} fps', flush=True)

    if 3 in wanted:
        rgbs = jnp.asarray((rng.random((b8, h, w, 3)) * 0.8).astype(np.float32))

        def denoise_chain(x):
            def one(im):
                a = nlm.wavelet_denoise(im, 0.05)
                return nlm.nlm_denoise(a, 0.05)

            # lax.map, not vmap: batching the Pallas NLM kernel multiplies
            # its scoped-VMEM need past the cap (same policy as the fused
            # pipeline's large-batch heavy stages).
            return jax.lax.map(one, x)

        dt = _bench_chained(denoise_chain, rgbs, 2) / b8
        report['config3_wavelet_nlm_b8'] = {'seconds_per_frame': dt, 'fps': 1.0 / dt}
        print(f'config 3 (wavelet+NLM, batch {b8}): {1 / dt:.2f} fps', flush=True)

    if 4 in wanted:
        lum = jnp.asarray((rng.random((h, w)) * 0.8).astype(np.float32))
        params = tm.TonemapParameters(gamma=1.5, intensity=2.0, vibrance=0.5)
        metrics = jnp.asarray([-1.5, 0.3, 0.3, 0.35, 0.25], dtype=jnp.float32)

        def lc_tonemap(x):
            y = lap.local_laplacian(x, lap.LaplacianParams())
            rgb = jnp.stack([y, y, y], axis=-1)
            u1 = tm.reinhard_tonemap(rgb, metrics, params)
            u2 = tm.filmic_tonemap(rgb, params)
            u3 = tm.aces_tonemap(rgb, params)
            return x + 1e-12 * (u1[..., 0] + u2[..., 0] + u3[..., 0]).astype(jnp.float32)

        dt = _bench_chained(lc_tonemap, lum, 2)
        report['config4_laplacian_tonemaps'] = {'seconds_per_frame': dt, 'fps': 1.0 / dt}
        print(f'config 4 (laplacian + 3 tonemaps): {1 / dt:.2f} fps', flush=True)

    if 5 in wanted:
        from tpu_darktable.pipeline.image_processor import ImageProcessor
        from tpu_darktable.pipeline.streaming import StreamingExecutor

        settings = ImageProcessingSettings(
            debayer=Debayer.rcd, postprocess=True, enable_denoise=True,
            enable_bilateral=True, tone_mapping=ToneMapper.adaptive_aces,
            tone_gamma=1.5, tone_intensity=2.0, light_adapt=0.8, vibrance=0.5,
        )
        proc = ImageProcessor(
            (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12, settings,
            white_balance=(1.2, 1.0, 1.1),
        )
        # The production streaming runtime: ISP batches dispatch async; in
        # device-JPEG mode (auto on TPU) each batch's JPEG device work is
        # dispatched before the next batch's ISP, double-buffered so only
        # the ~2-4 MB compressed streams cross the host<->device link while
        # the next batch computes (nvJPEG's on-stream contract,
        # jpeg_encoder.cu:117-173).
        ex = StreamingExecutor(proc, batch_size=2, jpeg_quality=90,
                               keep_images=False)
        # Representative camera content, not random bytes: the reference
        # harness benches a real photo (run_benchmark.py:54 load_image).
        # Incompressible noise frames inflate the JPEG streams ~5x (to
        # ~15 MB/frame measured), turning the config into a pure tunnel-
        # transfer measurement instead of a streaming-ISP one.
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        scene = np.stack([
            0.35 + 0.45 * np.sin(xx / 331) * np.cos(yy / 237),
            0.40 + 0.40 * np.cos(xx / 181 + yy / 419),
            0.45 + 0.35 * np.sin((xx + 2 * yy) / 293),
        ], axis=-1)
        scene = np.clip(
            scene + rng.normal(0, 0.01, scene.shape), 0.0, 1.0
        ).astype(np.float32)
        mosaic = np.asarray(td.rgb_to_bayer(jnp.asarray(scene)))[..., 0]
        data = np.asarray(td.encode(
            jnp.asarray(mosaic.reshape(-1)), td.PackedFormat.Packed12))

        # warmup batch: compiles the fused ISP + the device JPEG programs
        ex.run([(f'warm{i}', data) for i in range(2)])

        n_frames = b32
        frames = [(f'f{i}', data) for i in range(n_frames)]
        t0 = time.perf_counter()
        results = ex.run(frames)
        dt = (time.perf_counter() - t0) / n_frames
        bad = [r.name for r in results
               if r.error is not None or not (r.jpeg or b'').startswith(b'\xff\xd8')]
        assert not bad, f'streaming failures: {bad}'
        jpeg_mb = float(np.mean([len(r.jpeg) for r in results])) / 1e6
        report['config5_full_isp_jpeg_stream'] = {
            'seconds_per_frame': dt, 'fps': 1.0 / dt,
            'jpeg_mb_per_frame': round(jpeg_mb, 2),
        }
        print(f'config 5 (full ISP + JPEG, {n_frames} frames streamed): '
              f'{1 / dt:.2f} fps ({jpeg_mb:.1f} MB/frame streams)', flush=True)

    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
        print(f'wrote {args.out}')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
