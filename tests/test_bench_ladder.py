"""bench.py ladder planning: the driver-graded harness must always bank a
real JSON line (cheapest rung first), verify AOT artifacts instead of
trusting markers, and never start an unboundable Mosaic compile (FULL /
BILAT16 cold compiles measured 531 s / 485 s in-program)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench

IDENT = 'abc123'


def _names(plan):
    return [name for name, _, _ in plan]


def test_artifact_full_runs_right_after_banking_rung():
    # FULL artifact present but nothing measured yet: bank the cheapest
    # cold rung first (BANK, 80 s expected < artifact's 90 s), then FULL
    # IMMEDIATELY - a multi-minute XLA16 cold compile must never stand
    # between the banked line and the flagship (it would only shrink FULL's
    # budget; the runner stops at FULL on success anyway).  XLA16 stays in
    # the plan as the post-FULL fallback.
    plan = bench._plan({}, IDENT, {'FULL'}, full_budget=240.0)
    assert _names(plan) == ['BANK', 'FULL', 'XLA16']
    # FULL is artifact-gated: require_aot so a stale artifact bails fast.
    assert plan[1][2] is True
    # Cold rungs may compile (no artifact requirement).
    assert plan[0][2] is False and plan[2][2] is False


def test_full_never_banks_first_even_with_cheap_marker():
    # FLIPPED from round 4's test_measured_fast_full_runs_first, which
    # pinned the fatal behavior: a post-anomaly FULL marker (its wall
    # excludes the 49-527 s first-execution anomaly because an earlier rung
    # paid it) must NOT promote FULL to the banking slot - BENCH_r04 died
    # exactly there (FULL first, 527 s anomaly, killed 3-10 s short of
    # banking, zero lines).  The banking rung is always a cheap XLA-only
    # rung, regardless of what any marker claims.
    markers = {'FULL': {'identity': IDENT, 'wall_s': 45.0, 'source': 'aot'}}
    plan = bench._plan(markers, IDENT, {'FULL'}, full_budget=240.0)
    assert _names(plan)[0] != 'FULL'
    assert _names(plan) == ['BANK', 'FULL', 'XLA16']


def test_r4_poisoned_marker_file_plans_bank_first():
    # The EXACT marker state that produced the BENCH_r04 zero (live in
    # ~/.cache/tpu_darktable/bench_warm.json after the r4 rehearsal): BANK
    # ran first so its wall INCLUDES the warmup anomaly (61.2 s), FULL ran
    # after so its wall excludes it (31.6 s).  r4's _plan scored FULL
    # cheaper and banked on it.  The fixed plan must order BANK first.
    markers = {
        'BANK': {'identity': IDENT, 'wall_s': 61.2, 'source': 'aot'},
        'FULL': {'identity': IDENT, 'wall_s': 31.6, 'source': 'aot'},
        'FULLFAST': {'identity': IDENT, 'wall_s': 25.3, 'source': 'aot'},
    }
    plan = bench._plan(markers, IDENT, {'FULL', 'FULLFAST', 'BANK', 'XLA16'},
                       full_budget=240.0)
    assert _names(plan) == ['BANK', 'FULL', 'XLA16']


def test_ordering_uses_anomaly_exclusive_steady_wall():
    # warmup1_s (anomaly + first execution) is persisted per marker; the
    # banking choice between the cheap rungs compares wall - warmup1.  Here
    # BANK's raw wall (61.2) exceeds XLA16's (40.0), but BANK paid a 49 s
    # anomaly: steady 12.2 vs 38.0 - BANK banks.
    markers = {
        'BANK': {'identity': IDENT, 'wall_s': 61.2, 'warmup1_s': 49.0,
                 'source': 'aot'},
        'XLA16': {'identity': IDENT, 'wall_s': 40.0, 'warmup1_s': 2.0,
                  'source': 'aot'},
    }
    plan = bench._plan(markers, IDENT, {'BANK', 'XLA16'}, full_budget=240.0)
    assert _names(plan)[0] == 'BANK'
    # And the reverse: XLA16 paid the anomaly, BANK ran warm.
    markers = {
        'BANK': {'identity': IDENT, 'wall_s': 40.0, 'warmup1_s': 2.0,
                 'source': 'aot'},
        'XLA16': {'identity': IDENT, 'wall_s': 61.2, 'warmup1_s': 49.0,
                  'source': 'aot'},
    }
    plan = bench._plan(markers, IDENT, {'BANK', 'XLA16'}, full_budget=240.0)
    assert _names(plan)[0] == 'XLA16'


def test_committed_cold_rung_artifacts_tighten_walls():
    # BANK/XLA16 artifacts committed alongside FULL's: the XLA-only rungs
    # reload in ~1 s too, so their planned budgets drop below the cold
    #-compile budgets while they stay compile-capable (not gated).
    plan = bench._plan({}, IDENT, {'FULL', 'BANK', 'XLA16'}, full_budget=240.0)
    assert _names(plan) == ['BANK', 'FULL', 'XLA16']
    budgets = {n: b for n, b, _ in plan}
    assert budgets['BANK'] < 2.5 * bench._COLD_WALL['BANK'] + 30.0
    assert budgets['XLA16'] < 2.5 * bench._COLD_WALL['XLA16'] + 30.0
    assert all(not gated for n, _, gated in plan if n != 'FULL')


def test_cold_banks_cheapest_first_and_never_compiles_mosaic():
    plan = bench._plan({}, IDENT, set(), full_budget=240.0)
    # No artifacts: only the XLA-only rungs (whose cold compile fits a
    # ladder budget) are planned; Mosaic rungs never run without artifacts.
    assert _names(plan) == ['BANK', 'XLA16']


def test_marker_without_artifact_does_not_unlock_mosaic_rungs():
    # VERDICT r3 weak #1: the marker VOUCHED for the cache and FULL still
    # recompiled >240 s.  A matching marker alone must not plan FULL.
    markers = {'FULL': {'identity': IDENT, 'wall_s': 40.0, 'source': 'aot'}}
    plan = bench._plan(markers, IDENT, set(), full_budget=240.0)
    assert 'FULL' not in _names(plan)


def test_stale_marker_budgets_from_cold_defaults():
    markers = {'XLA16': {'identity': 'other-code-state', 'wall_s': 10.0}}
    plan = bench._plan(markers, IDENT, set(), full_budget=240.0)
    budgets = dict((n, b) for n, b, _ in plan)
    # Stale marker's 10 s must not shrink XLA16's budget below the cold
    # default (2.5 * 150 + 30).
    assert budgets['XLA16'] >= 2.5 * bench._COLD_WALL['XLA16']


def test_budgets_scale_from_measured_walls():
    markers = {
        'BANK': {'identity': IDENT, 'wall_s': 20.0, 'source': 'compiled'},
        'FULL': {'identity': IDENT, 'wall_s': 60.0, 'source': 'aot'},
    }
    plan = bench._plan(markers, IDENT, {'FULL'}, full_budget=240.0)
    budgets = dict((n, b) for n, b, _ in plan)
    assert budgets['BANK'] == 2.5 * 20.0 + 30.0
    # FULL gets at least the caller's budget when that's larger.
    assert budgets['FULL'] == 240.0


def test_bilat16_deleted():
    # BILAT16 was never reachable by the ladder (its artifact shares FULL's
    # identity scheme); VERDICT r4 weak #6: delete rather than keep a
    # zombie config.  A hand-rolled env matching its old knobs stamps
    # CUSTOM, never a ladder name.
    import os
    assert 'BILAT16' not in bench._CONFIGS
    assert 'BILAT16' not in bench._ARTIFACT_GATED
    saved = {k: os.environ.pop(k, None) for k in bench._KNOB_KEYS}
    try:
        os.environ['TD_RCD_PALLAS'] = '0'
        assert bench._config_name_from_env() == 'CUSTOM'
    finally:
        for k in bench._KNOB_KEYS:
            os.environ.pop(k, None)
            if saved[k] is not None:
                os.environ[k] = saved[k]


def test_full_follows_banking_rung_when_present():
    for markers in ({}, {'BANK': {'identity': IDENT, 'wall_s': 15.0}}):
        plan = bench._plan(markers, IDENT, {'FULL'}, full_budget=240.0)
        assert _names(plan)[1] == 'FULL'


def test_legacy_string_marker_is_ignored():
    # Round-3 markers were bare identity strings: no measured wall, and
    # they must not unlock artifact-gated rungs or crash planning.
    plan = bench._plan({'FULL': IDENT}, IDENT, set(), full_budget=240.0)
    assert 'FULL' not in _names(plan)


def test_config_envs_match_names():
    # Each ladder rung's env overrides must round-trip through the name
    # the child process stamps on its JSON line.
    import os
    knobs = ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH',
             'TD_BENCH_FAST')
    for name, overrides in bench._CONFIGS.items():
        saved = {k: os.environ.pop(k, None) for k in knobs}
        try:
            os.environ.update(overrides)
            assert bench._config_name_from_env() == name
        finally:
            for k in knobs:
                os.environ.pop(k, None)
                if saved[k] is not None:
                    os.environ[k] = saved[k]


def test_mismatched_env_is_custom_not_bank():
    # ADVICE r3: TD_RCD_PALLAS=0 + batch 2 with the bilateral kernel still
    # on matches no rung - it must not stamp (or bank a marker for) BANK.
    import os
    knobs = ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH',
             'TD_BENCH_FAST')
    saved = {k: os.environ.pop(k, None) for k in knobs}
    try:
        os.environ['TD_RCD_PALLAS'] = '0'
        os.environ['TD_BENCH_BATCH'] = '2'
        assert bench._config_name_from_env() == 'CUSTOM'
        os.environ['TD_BENCH_FAST'] = '1'
        assert bench._config_name_from_env() == 'CUSTOM'
    finally:
        for k in knobs:
            os.environ.pop(k, None)
            if saved[k] is not None:
                os.environ[k] = saved[k]


def test_program_identity_distinguishes_rungs():
    ids = {bench._program_identity(IDENT, n) for n in bench._CONFIGS}
    assert len(ids) == len(bench._CONFIGS)


def test_child_first_rung_always_runs():
    # The banking rung runs regardless of budget: there is nothing to
    # protect yet, and it is the rung that eats the first-execution
    # anomaly (130-400+ s, unboundable) on behalf of the whole ladder.
    assert bench._child_skip_reason('BANK', set(), 5.0, False) is None


def test_child_stops_grading_after_full():
    banked = {'BANK', 'FULL'}
    assert bench._child_skip_reason('XLA16', banked, 1e9, True) is not None
    # FULLFAST is the one post-FULL extra (stderr line, never graded).
    assert bench._child_skip_reason('FULLFAST', banked, 1e9, True) is None


def test_child_fullfast_requires_full():
    assert bench._child_skip_reason('FULLFAST', {'BANK'}, 1e9, True) is not None


def test_child_budget_gates_after_first_bank():
    # Once a line is banked, a rung only runs if the remaining global
    # budget covers its steady-state estimate; artifact rungs estimate
    # cheaper than compile rungs.
    banked = {'BANK'}
    est_aot = bench._STEADY_AOT['XLA16']
    est_compile = bench._STEADY_COMPILE['XLA16']
    assert bench._child_skip_reason('XLA16', banked, est_aot + 1, True) is None
    assert bench._child_skip_reason('XLA16', banked, est_aot - 1, True) is not None
    assert bench._child_skip_reason('XLA16', banked, est_compile - 1, False) is not None


def test_child_never_budget_skips_full_with_artifact():
    # Round-5 tiny-budget overtime exercise: the parent granted the FULL
    # window but the child had already skipped FULL on '-10s remaining'.
    # A FULL-from-artifact attempt is bounded and any banked fallback is
    # flush-protected, so the flagship never budget-skips while its
    # artifact exists - even deep in the negative.
    assert bench._child_skip_reason('FULL', {'BANK'}, -100.0, True,
                                    attempted=1) is None
    # Without an artifact the gate still protects against an unbounded
    # Mosaic compile.
    assert bench._child_skip_reason('FULL', {'BANK'}, -100.0, False,
                                    attempted=1) is not None
    # Already-banked still skips.
    assert bench._child_skip_reason('FULL', {'FULL'}, 1e9, True) is not None


def test_child_budget_gates_after_failed_attempt():
    # ADVICE r4: a FAILED first rung (nothing banked) must not hand the
    # next rung - potentially a 350 s XLA16 cold compile - an unchecked
    # budget.  Once any rung has been attempted, the steady-state gate
    # applies even with nothing banked.
    est = bench._STEADY_COMPILE['XLA16']
    assert bench._child_skip_reason('XLA16', set(), est - 1, False,
                                    attempted=1) is not None
    assert bench._child_skip_reason('XLA16', set(), est + 1, False,
                                    attempted=1) is None


def test_parent_note_parsing():
    # The grace window and the early fallback key off the child's streamed
    # notes; pin the regexes against the exact _note formats.
    line = '[bench] 01:02:03 +536.6s FULL: warmup done (first execution 527.2s), timing'
    m = bench._TIMING_RE.search(line)
    assert m and m.group(1) == 'FULL'
    done = '[bench] 01:02:13 +546.6s FULL: done, 18.42 fps'
    m = bench._SETTLED_RE.search(done)
    assert m and m.group(1) == 'FULL'
    failed = '[bench] 01:02:13 +546.6s FULL: failed (RuntimeError: boom)'
    m = bench._SETTLED_RE.search(failed)
    assert m and m.group(1) == 'FULL'
    assert bench._FULL_DEAD_RE.search(failed)
    missing = ('[bench] 01:00:03 +36.6s FULL: AOT artifact missing/stale for '
               'this identity; skipping (never compiling a Mosaic config '
               'under a budget)')
    assert bench._FULL_DEAD_RE.search(missing)
    skipped = '[bench] 01:00:03 +36.6s FULL: skipped (40s remaining < 80s steady-state estimate)'
    assert bench._FULL_DEAD_RE.search(skipped)
    # BANK lines must not mark FULL dead.
    bank_fail = '[bench] 01:00:03 +36.6s BANK: failed (RuntimeError: boom)'
    assert not bench._FULL_DEAD_RE.search(bank_fail)
    # Prewarm notes drive the anomaly-in-flight grace branch.
    pre = '[bench] 01:00:10 +7.3s prewarm: first device execution fenced in 7.3s'
    assert bench._PREWARM_RE.search(pre)
    pre_fail = '[bench] 01:00:10 +7.3s prewarm failed (RuntimeError: boom)'
    assert bench._PREWARM_RE.search(pre_fail)
    assert not bench._PREWARM_RE.search(bank_fail)


def test_child_budget_credits_anomaly():
    # Round 5: a cold tunnel measured 779-1040 s first-execution anomalies
    # - past any self-budget.  The child's budget bounds its OWN work, so
    # the measured prewarm (anomaly) wall is credited back: after a
    # 900 s anomaly and 60 s of real work, a 540 s budget has 480 s left.
    assert bench._remaining_budget(540.0, 960.0, 900.0) == 480.0
    # Prewarm not fenced yet: everything so far is anomaly-overlapped
    # setup; the full budget remains.
    assert bench._remaining_budget(540.0, 700.0, None) == 540.0
    # No anomaly to speak of: plain countdown.
    assert bench._remaining_budget(540.0, 100.0, 5.0) == 445.0
    # Credit never exceeds elapsed (a prewarm wall from a contended clock
    # must not mint budget).
    assert bench._remaining_budget(540.0, 50.0, 900.0) == 540.0


def test_expiry_never_kills_with_nothing_banked():
    # A self-kill with zero banked lines GUARANTEES the round a zero
    # (BENCH_r04); waiting risks nothing since the external timeout is the
    # real bound.  'wait' regardless of grace/window state.
    for prewarm_done in (False, True):
        action, _ = bench._expiry_action(
            banked_any=False, timing=None, prewarm_done=prewarm_done,
            full_dead=False, full_possible=True,
            grace_used=True, full_window_used=True)
        assert action == 'wait'


def test_expiry_grace_for_rung_mid_timing():
    action, _ = bench._expiry_action(
        banked_any=True, timing='FULL', prewarm_done=True, full_dead=False,
        full_possible=True, grace_used=False, full_window_used=False)
    assert action == 'grace'
    # Grace is one-shot; with it spent and FULL still live, the flagship
    # window applies next.
    action, _ = bench._expiry_action(
        banked_any=True, timing='FULL', prewarm_done=True, full_dead=False,
        full_possible=True, grace_used=True, full_window_used=False)
    assert action == 'full_window'


def test_expiry_full_window_then_kill():
    # Fallback banked, FULL live: grant its steady window once...
    action, _ = bench._expiry_action(
        banked_any=True, timing=None, prewarm_done=True, full_dead=False,
        full_possible=True, grace_used=False, full_window_used=False)
    assert action == 'full_window'
    # ...then kill (printing the banked fallback).
    action, _ = bench._expiry_action(
        banked_any=True, timing=None, prewarm_done=True, full_dead=False,
        full_possible=True, grace_used=False, full_window_used=True)
    assert action == 'kill'


def test_expiry_kills_when_full_dead():
    # FULL can never bank (artifact missing / run failed): no window, print
    # the fallback and stop.
    action, _ = bench._expiry_action(
        banked_any=True, timing=None, prewarm_done=True, full_dead=True,
        full_possible=False, grace_used=False, full_window_used=False)
    assert action == 'kill'


def test_marker_roundtrip_persists_warmup1(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, '_MARKER_PATH',
                        str(tmp_path / 'bench_warm.json'))
    bench._write_marker('BANK', IDENT, 61.2, source='aot', warmup1_s=49.0)
    bench._write_marker('XLA16', IDENT, 40.0, source='aot')  # legacy shape
    markers = bench._read_markers()
    assert bench._marker_wall(markers, 'BANK', IDENT) == (61.2, 49.0, 'aot')
    w, w1, src = bench._marker_wall(markers, 'XLA16', IDENT)
    assert (w, src) == (40.0, 'aot') and w1 is None


def test_ladder_child_end_to_end_cpu(tmp_path):
    # The whole --child-ladder path in a real subprocess on the CPU backend
    # (tiny shapes): env plumbing, rung compile, banking, the flushed
    # results file, and the marker fields the parent relies on.  Forced to
    # CPU via jax.config BEFORE backend init (the env var alone loses to
    # the TPU plugin on this host) so the test can NEVER contend for the
    # real device.
    import json
    import os
    import subprocess
    import sys

    results = tmp_path / 'results.jsonl'
    env = dict(os.environ)
    env.update({
        'TD_BENCH_W': '256', 'TD_BENCH_H': '192', 'TD_BENCH_ITERS': '2',
        'TD_BENCH_PLAN': json.dumps([['BANK', False, False]]),
        'TD_BENCH_RESULTS': str(results),
        'TD_BENCH_CHILD_BUDGET': '600',
        'TD_BENCH_CODE_IDENTITY': 'ladder-e2e-test',
        'TD_AOT_DIR': str(tmp_path / 'aot'),  # sandbox any artifact save
    })
    code = (
        'import sys, jax; jax.config.update("jax_platforms", "cpu"); '
        'import bench; sys.exit(bench._ladder_child())'
    )
    r = subprocess.run(
        [sys.executable, '-c', code], env=env, capture_output=True,
        text=True, timeout=600,
        cwd=Path(__file__).resolve().parent.parent,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # stdout stays empty: the parent owns the graded line.
    assert r.stdout.strip() == ''
    entries = [json.loads(l) for l in results.read_text().splitlines()]
    assert [e['config'] for e in entries] == ['BANK']
    e = entries[0]
    assert e['result']['value'] > 0
    assert e['result']['config'] == 'BANK'
    assert '[BANK fallback config]' in e['result']['metric']
    # The fields _plan's anomaly-exclusive ordering needs.
    assert e['warmup1_s'] >= 0 and e['wall_s'] >= e['warmup1_s']
    assert e['source'] in ('compiled', 'aot')


def test_graded_entry_prefers_full_then_best_value():
    mk = lambda cfg, fps: {'config': cfg, 'result': {'value': fps, 'config': cfg}}
    assert bench._graded_entry([]) is None
    entries = [mk('BANK', 12.5), mk('XLA16', 16.3), mk('FULLFAST', 26.0)]
    # FULLFAST (ov=2 speed preset) is never the graded metric.
    assert bench._graded_entry(entries)['config'] == 'XLA16'
    entries.append(mk('FULL', 18.4))
    assert bench._graded_entry(entries)['config'] == 'FULL'
