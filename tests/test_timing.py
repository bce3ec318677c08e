"""utils/timing: stage timer and chained benchmark protocol."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.utils import StageTimer, benchmark_op


def test_stage_timer(rng):
    t = StageTimer()
    x = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    with t.stage('double') as st:
        st.record(x * 2.0)
    with t.stage('square') as st:
        st.record(x * x)
    assert [n for n, _ in t.timings] == ['double', 'square']
    assert all(dt >= 0 for _, dt in t.timings)
    t.print_timings()
    t.reset()
    assert not t.timings


def test_stage_timer_disabled():
    t = StageTimer(enabled=False)
    with t.stage('noop'):
        pass
    assert not t.timings


def test_benchmark_op(rng):
    x = jnp.asarray(rng.random((128, 128)).astype(np.float32))
    dt = benchmark_op(lambda v: v * 0.5 + 0.1, x, iters=5, warmup=1)
    assert dt > 0
