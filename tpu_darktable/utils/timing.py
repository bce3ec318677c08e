"""Per-stage timing and profiling.

TPU analog of the reference's opt-in CudaTimer (csrc/cuda_utils.h:40-77,
used in laplacian.cu:464-475) and the CUDA-event benchmark harness
(scripts/run_benchmark.py:16-39):

- StageTimer: named wall-clock stages with device fencing.  On transports
  where block_until_ready does not synchronize (the axon tunnel), completion
  is fenced by materializing a scalar derived from the stage output.
- benchmark_op: the measurement protocol used by run-benchmark - ops chained
  on-device via lax.scan so per-dispatch latency does not pollute results.
- trace_to: context manager around jax.profiler for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


def _fence(value):
    """Force completion of `value` (tree) with a minimal transfer."""
    leaves = [x for x in jax.tree_util.tree_leaves(value) if hasattr(x, 'dtype')]
    if not leaves:
        return
    x = leaves[0]
    np.asarray(jnp.sum(x.astype(jnp.float32)) if x.ndim else x)


class StageTimer:
    """Named stage timer with device fencing.

    >>> timer = StageTimer()
    >>> with timer.stage('demosaic'):
    ...     rgb = rcd_demosaic(bayer, pattern)   # fenced on exit
    >>> timer.print_timings()

    Note: fencing serializes stages, so totals exceed the fused pipeline's
    wall clock - use for per-stage attribution, not throughput numbers.
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.timings: list[tuple[str, float]] = []
        self._result = None

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield self
            return
        holder = self
        t0 = time.perf_counter()
        yield holder
        if holder._result is not None:
            _fence(holder._result)
            holder._result = None
        self.timings.append((name, time.perf_counter() - t0))

    def record(self, value):
        """Register the stage's output for fencing (call inside the stage)."""
        self._result = value
        return value

    def print_timings(self):
        total = sum(t for _, t in self.timings)
        for name, t in self.timings:
            print(f'  {name:32s} {t * 1e3:9.2f} ms')
        print(f'  {"total":32s} {total * 1e3:9.2f} ms')

    def reset(self):
        self.timings.clear()


def benchmark_op(fn, x0, iters: int = 10, warmup: int = 2) -> float:
    """Seconds per iteration of `fn`, chained on-device (one dispatch)."""

    def chained(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    f = jax.jit(chained)
    for _ in range(warmup):
        out = f(x0)
    _fence(out)
    t0 = time.perf_counter()
    out = f(x0)
    _fence(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
