"""bench.py ladder planning: the driver-graded harness must always bank a
real JSON line (cheap rung first when cold) and never attempt the FULL
config cold (its Mosaic compile is unboundable on this host)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench

IDENT = 'abc123'


def test_warm_full_runs_full_first():
    plan = bench._plan({'FULL': IDENT}, IDENT, 240.0)
    assert plan[0][0] == 'FULL'
    assert plan[-1][0] == 'BANK'  # a fallback rung always exists


def test_cold_banks_cheapest_first_and_never_compiles_mosaic():
    plan = bench._plan({}, IDENT, 240.0)
    assert plan[0][0] == 'BANK'
    # FULL and BILAT16 both carry Mosaic compiles that cannot fit a cold
    # ladder budget (5-25 min / 485 s measured) - cold rungs are XLA-only.
    assert [name for name, _ in plan] == ['BANK', 'XLA16']


def test_stale_marker_is_cold():
    plan = bench._plan({'FULL': 'other-code-state'}, IDENT, 240.0)
    assert plan[0][0] == 'BANK'


def test_partial_warm_resumes_from_best_known_rung():
    assert bench._plan({'BILAT16': IDENT}, IDENT, 240.0)[0][0] == 'BILAT16'
    assert bench._plan({'XLA16': IDENT}, IDENT, 240.0)[0][0] == 'XLA16'


def test_config_envs_match_names():
    # Each ladder rung's env overrides must round-trip through the name
    # the child process stamps on its JSON line.
    import os
    for name, overrides in bench._CONFIGS.items():
        saved = {k: os.environ.pop(k, None)
                 for k in ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH')}
        try:
            os.environ.update(overrides)
            assert bench._config_name_from_env() == name
        finally:
            for k in ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH'):
                os.environ.pop(k, None)
                if saved[k] is not None:
                    os.environ[k] = saved[k]
