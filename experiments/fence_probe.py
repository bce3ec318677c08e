#!/usr/bin/env python
"""Measure per-iteration fencing cost in the bench timed loop.

Protocol A (old): fence (np.asarray of the metrics output) after EVERY
iteration - each fence is a host<->device tunnel round trip that idles the
device between dispatches.
Protocol B (new): dispatch all iterations back-to-back, fence ONCE on a
reduction over all metrics outputs.

Interleaved A/B/A/B... x reps on the same loaded FULL executable, first
pair discarded (first-timing bias, BASELINE.md measurement hazard).
Run alone on the TPU.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

import bench
from tpu_darktable.utils import aot


def main():
    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    iters = int(os.environ.get('TD_BENCH_ITERS', '8'))
    width, height = 4096, 3000
    identity = bench._identity()
    pid = bench._program_identity(identity, 'FULL')
    compiled = aot.load(pid)
    assert compiled is not None, 'FULL artifact missing for current identity'
    args = bench._make_args(batch, width, height)

    # warmup (pays the first-execution anomaly + clock ramp)
    for i in range(5):
        t = time.perf_counter()
        out, b, m = compiled(*args)
        np.asarray(m)
        print(f'[probe] warmup {i}: {time.perf_counter() - t:.2f}s',
              file=sys.stderr, flush=True)

    def proto_a():
        t0 = time.perf_counter()
        for _ in range(iters):
            out, b, m = compiled(*args)
            np.asarray(m)
        return (time.perf_counter() - t0) / (iters * batch)

    def proto_b():
        t0 = time.perf_counter()
        ms = []
        for _ in range(iters):
            out, b, m = compiled(*args)
            ms.append(m)
        np.asarray(jnp.stack(ms).sum(0))
        return (time.perf_counter() - t0) / (iters * batch)

    reps = int(os.environ.get('PROBE_REPS', '4'))
    rows = []
    for r in range(reps):
        a = proto_a()
        bt = proto_b()
        rows.append((a, bt))
        print(f'[probe] rep {r}: per-iter fence {1/a:6.2f} fps  '
              f'single fence {1/bt:6.2f} fps', file=sys.stderr, flush=True)
    # discard rep 0 (first-timing bias)
    va = sorted(a for a, _ in rows[1:])
    vb = sorted(b for _, b in rows[1:])
    med_a, med_b = va[len(va) // 2], vb[len(vb) // 2]
    print(f'median per-iter fence: {1/med_a:.2f} fps ({med_a*1e3*batch:.1f} ms/iter)')
    print(f'median single fence:   {1/med_b:.2f} fps ({med_b*1e3*batch:.1f} ms/iter)')
    print(f'fence overhead: {(med_a-med_b)*1e3*batch:.1f} ms/iter '
          f'= {(med_a-med_b)*1e3:.2f} ms/frame')


if __name__ == '__main__':
    main()
