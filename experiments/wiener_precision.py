"""Measure Wiener precision-mix error (vs fp64 numpy oracle) and 12MP timing.

Usage: python experiments/wiener_precision.py [--time-only|--err-only]
Error runs on whatever backend; timing needs the real TPU.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / 'tests'))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops import wiener
from tpu_darktable.utils.timing import benchmark_op

P = jax.lax.Precision
COMBOS = {
    'HIGH/HIGH': (P.HIGH, P.HIGH),
    'HIGH/DEFAULT': (P.HIGH, P.DEFAULT),
    'DEFAULT/HIGH': (P.DEFAULT, P.HIGH),
    'DEFAULT/DEFAULT': (P.DEFAULT, P.DEFAULT),
}


def errs():
    from test_wiener import _wiener_numpy_reference

    rng = np.random.default_rng(7)
    img = rng.random((72, 88, 1)).astype(np.float32)
    for k, ov in [(32, 4), (32, 2)]:
        ref = _wiener_numpy_reference(img.astype(np.float64), 0.05, k, ov)
        for name, combo in COMBOS.items():
            out = np.asarray(jax.jit(
                lambda x: wiener.wiener_denoise(x, 0.05, k, ov, precision=combo)
            )(jnp.asarray(img)))
            print(f'k={k} ov={ov} {name:16s} maxerr {np.abs(out - ref).max():.2e}')


def times():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((3000, 4096, 1)).astype(np.float32))
    for ov in (4, 2):
        for name, combo in COMBOS.items():
            fn = lambda x: wiener.wiener_denoise(x, 0.05, 32, ov, precision=combo)
            t = benchmark_op(fn, img, iters=4)
            print(f'12MP c=1 ov={ov} {name:16s} {t * 1e3:8.1f} ms')


if __name__ == '__main__':
    if '--time-only' not in sys.argv:
        errs()
    if '--err-only' not in sys.argv:
        times()
