"""Hardware sweep: bilateral at 12MP across the viewer-settable sigma grid.

The sigma_s=8 scoped-VMEM compile OOM (fixed by the 30 MB vmem_ok cutoff)
was invisible to the CPU interpret tests — Mosaic stack allocation only
exists on the real backend.  This sweep compiles+runs every realistic
(sigma_s, sigma_r) corner of the auto-Pallas path at 12MP on the actual
TPU and checks it against the XLA chain, so no user-reachable bilateral
configuration can fail at compile time.

Run alone on the TPU: python experiments/bilateral_sigma_sweep.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import bilateral as B

H, W = 3000, 4096

CASES = [
    # (sigma_s, sigma_r)  — band kernel: s = 1 / 4 / 8 and a deep-gz case
    (1.0, 0.2),
    (4.0, 0.2),
    (8.0, 0.1),
    (2.0, 0.05),   # gz = 21: slab budget scales with gz -> bg drops to 32
    (2.5, 0.2),    # non-integer sigma: general splat path (no band kernel)
]


def main():
    rng = np.random.default_rng(0)
    lum = jnp.asarray(rng.random((H, W), dtype=np.float32))
    failures = 0
    for ss, sr in CASES:
        ref = np.asarray(B.bilateral_process(lum, ss, sr, 0.4, _use_band_kernel=False))
        t0 = time.time()
        try:
            out = np.asarray(B.bilateral_process(lum, ss, sr, 0.4))  # auto path
        except Exception as e:
            print(f'ss={ss} sr={sr}: FAILED {str(e)[:140]}', flush=True)
            failures += 1
            continue
        d = np.abs(out - ref).max()
        status = 'OK' if d < 1e-5 else 'DIVERGED'
        failures += status != 'OK'
        print(f'ss={ss} sr={sr}: {status} maxdiff {d:.2e} ({time.time()-t0:.0f}s '
              'incl. compile)', flush=True)
    print('failures:', failures)
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
