"""Knockout profile: fused-pipeline ms/frame with stages toggled off.

Run alone on the TPU (axon serializes concurrent processes silently).
Usage: python experiments/pipeline_knockout.py [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
from tpu_darktable.pipeline.image_processor import build_pipeline_fn

_num_args = [a for a in sys.argv[1:] if a.isdigit()]
B = int(_num_args[0]) if _num_args else 16
W, H = 4096, 3000

VARIANTS = {
    'full': {},
    'no_denoise': dict(enable_denoise=False),
    'no_bilateral': dict(enable_bilateral=False),
    'no_postprocess': dict(postprocess=False),
    'bilinear_demosaic': dict(debayer=Debayer.bilinear),
    'minimal': dict(enable_denoise=False, enable_bilateral=False,
                    postprocess=False, debayer=Debayer.bilinear),
}


def time_variant(kw, data, wb):
    base = dict(debayer=Debayer.rcd, postprocess=True, enable_denoise=True,
                enable_bilateral=True, tone_mapping=ToneMapper.adaptive_aces)
    base.update(kw)
    s = ImageProcessingSettings(**base)
    fn = jax.jit(build_pipeline_fn(s, (W, H), td.BayerPattern.RGGB,
                                   td.PackedFormat.Packed12, True))
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)
    out, b2, m2 = fn(data, wb, bounds, metrics, alpha)
    float(np.asarray(jnp.sum(m2)))  # fence (block_until_ready lies on axon)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out, b2, m2 = fn(data, wb, b2, m2, alpha)
    float(np.asarray(jnp.sum(m2)) + np.asarray(out[0, 0, 0, 0]).astype(np.float32))
    dt = (time.perf_counter() - t0) / (iters * B)
    return dt * 1e3


def main():
    rng = np.random.default_rng(0)
    n_bytes = H * W * 3 // 2
    data = jnp.asarray(rng.integers(0, 255, (B, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], jnp.float32)
    names = [a for a in sys.argv[1:] if not a.isdigit()] or list(VARIANTS)
    for name in names:
        ms = time_variant(VARIANTS[name], data, wb)
        print(f'{name:20s} {ms:7.1f} ms/frame', flush=True)


if __name__ == '__main__':
    main()
