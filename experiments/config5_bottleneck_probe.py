#!/usr/bin/env python
"""Config-5 bottleneck attribution: is the streaming fps input-transfer-bound?

BASELINE config 5 streams packed-12 RAW frames (18.4 MB each at 12MP)
host -> device, runs the fused ISP, and reads back ~1.4 MB JPEG streams.
On the axon tunnel the host<->device link measured ~12 MB/s (BASELINE.md
"Environment characterization"), which predicts an INPUT-transfer floor of
~1.5 s/frame regardless of ISP speed.  This probe measures each leg in
isolation in one process:

  1. input transfer: host numpy packed frame -> device (jnp.asarray + fence)
  2. ISP compute: the fused pipeline program on a resident batch
  3. output transfer: the JPEG entropy stream readback

Run alone on the TPU: python experiments/config5_bottleneck_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax.numpy as jnp

    import tpu_darktable as td

    w, h = 4096, 3000
    n_bytes = h * w * 3 // 2
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, n_bytes, dtype=np.uint8)

    def fence(x):
        return np.asarray(jnp.sum(x, dtype=jnp.int32))

    # Warm the transfer path + sum program (and the process's first-dispatch
    # anomaly) before timing.
    fence(jnp.asarray(frame[: 1 << 20]))

    reps = 5
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jnp.asarray(frame)
        fence(dev)
        walls.append(time.perf_counter() - t0)
        del dev
    walls = sorted(walls)[1:-1]  # trim min/max (drift protocol)
    per_frame = float(np.mean(walls))
    mb = n_bytes / 1e6
    print(f'input transfer: {per_frame:.2f} s/frame for {mb:.1f} MB '
          f'-> {mb / per_frame:.1f} MB/s effective', flush=True)
    print(f'implied config-5 input-bound ceiling: {1.0 / per_frame:.2f} fps',
          flush=True)


if __name__ == '__main__':
    main()
