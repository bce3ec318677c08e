"""Where does the 'minimal' knockout stage (~17 ms/frame) go at 12MP?

Times the components of the decode -> WB -> bounds -> normalize ->
adaptive-ACES tail chain standalone on the TPU (bench.py settings:
gamma=1.5, intensity=2.0, light_adapt=0.8, vibrance=0.5).  Standalone
phases exceed the fused program (cross-phase fusion), but the ratios
identify the dominant component.

Run alone on the TPU: python experiments/minimal_stage_profile.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops import color as C
from tpu_darktable.ops import packed as P
from tpu_darktable.ops import tonemap as T
from tpu_darktable.ops import white_balance as WB
from tpu_darktable.ops.bayer import BayerPattern
from tpu_darktable.utils.timing import benchmark_op

H, W = 3000, 4096
PARAMS = T.TonemapParameters(gamma=1.5, intensity=2.0, light_adapt=0.8, vibrance=0.5)


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, 256, (H, (W * 3) // 2), dtype=np.uint8))
    bayer = jnp.asarray(rng.random((H, W), dtype=np.float32))
    rgb = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    metrics = jnp.asarray([-0.7, 0.49, 0.49, 0.47, 0.6], jnp.float32)
    wb = jnp.asarray([1.2, 1.0, 1.1], jnp.float32)

    # each fn maps its input to a same-shaped carry for scan chaining
    variants = [
        ('decode12', lambda x: (P.decode12_float(rows) * 1e-9 + x), bayer),
        ('wb_apply', lambda x: WB.apply_white_balance(x, wb, BayerPattern.RGGB) * 0.5, bayer),
        ('bounds_s8', lambda x: x + T.compute_image_bounds(x, stride=8)[0] * 1e-9, rgb),
        ('metrics_s8', lambda x: x + T.compute_image_metrics(x, stride=8)[0] * 1e-9, rgb),
        ('adapt+aces', lambda x: T._aces_curve(
            x / T._compute_adaptation(metrics, x, PARAMS.light_adapt, PARAMS.intensity)) * 0.5 + 0.25,
         rgb),
        ('gamma_pow', lambda x: jnp.power(jnp.maximum(x, 0.0), 1.0 / PARAMS.gamma) * 0.5 + 0.25, rgb),
        ('vibrance', lambda x: C.modify_vibrance(x, PARAMS.vibrance) * 0.5 + 0.25, rgb),
        ('uint8+back', lambda x: T._to_uint8(x).astype(jnp.float32) / 255.0, rgb),
        ('full_tail', lambda x: T.aces_tonemap(x, PARAMS, metrics).astype(jnp.float32) / 255.0, rgb),
    ]

    results = {name: [] for name, _, _ in variants}
    for rnd in range(3):
        for name, fn, x0 in variants:
            t = benchmark_op(fn, x0, iters=6, warmup=1)
            results[name].append(t * 1e3)
            print(f'round {rnd} {name:12s} {t * 1e3:7.2f} ms', flush=True)
    print()
    for name, ts in results.items():
        print(f'{name:12s} steady {min(ts[1:]):7.2f} ms   (all: '
              + ', '.join(f'{t:.2f}' for t in ts) + ')', flush=True)


if __name__ == '__main__':
    main()
