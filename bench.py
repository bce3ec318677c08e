#!/usr/bin/env python
"""Benchmark: full fused ISP pipeline, 12MP RAW -> sRGB frames/sec on one chip.

Measures the flagship path (decode12 -> WB -> RCD -> postprocess -> Wiener ->
bilateral -> metrics -> adaptive tonemap -> uint8) as ONE jitted XLA program,
the BASELINE.json north-star configuration.  Prints one JSON line (stdout
carries nothing else; progress goes to stderr).

Driver-proofing (rounds 3-4).  BENCH_r02 was rc=124 and BENCH_r03 banked a
fallback config because XLA's persistent compile cache could not be trusted
across driver runs: its cache key embeds a backend fingerprint that drifts
across axon tunnel sessions, so a "warm" cache still recompiled the flagship
program (~531 s measured).  Round 4 replaced vouching with verification:

  * Compiled executables are serialized under our own deterministic key
    (tpu_darktable.utils.aot, jax.experimental.serialize_executable); a
    fresh process deserializes the flagship program in ~1-12 s instead of
    recompiling.  Artifacts committed under artifacts/aot/ ride with the
    code to fresh hosts.
  * The ladder checks the artifact FILE for the exact program identity
    before planning a rung (not a marker's word for it) and always banks
    the cheapest available rung first so a real JSON line exists before
    any gamble.  FULL runs with a load-only artifact gate: it either
    reloads its artifact in seconds or is skipped - never an unboundable
    compile.  Rungs without an artifact (BANK, XLA16) are XLA-only
    programs whose cold compile fits the budget; FULL/FULLFAST/BILAT16
    carry Mosaic kernels (531 s / 485 s measured cold in-program) and are
    artifact-gated.
  * ALL rungs run inside ONE child process.  The first device execution
    in a fresh process stalls for an unbounded warmup anomaly on this
    tunnel (measured 130-400+ s, varying by host - BASELINE.md "first-
    execution anomaly"); per-rung child processes each paid it, and a
    >360 s anomaly on one host blew FULL's per-rung budget even though
    the artifact loaded in 12 s.  One process pays the anomaly exactly
    once - during the cheap banking rung's first warmup - and every rung
    after it runs on a warmed device at steady-state cost (~30-70 s).
  * The child appends each banked rung to a results file, flushed per
    line; the parent tails it while the child runs and prints the graded
    stdout line THE MOMENT the flagship banks (a later kill - the
    driver's or the total budget's - can no longer cost the round its
    number).  After a successful FULL, the FULLFAST rung (ov=2 speed
    preset) runs if its artifact is present and budget remains - its
    line goes to stderr, never the graded stdout.
  * ``python bench.py --build-artifacts [RUNGS...]`` is the round-end
    build: compiles each rung in-process (no budget) and serializes the
    executables into the committed artifacts/aot/ dir.

Budget story: TD_BENCH_TOTAL_BUDGET (default 540 s) bounds the whole run.
Happy path (artifacts present): imports + BANK reload + one warmup anomaly
(130-400 s) + BANK timing + FULL reload/warmup/timing at steady cost -
the graded line lands between ~180 s (mild anomaly) and ~520 s (worst
measured).  Cold hosts without artifacts bank a compiled XLA-only line
instead (~80-340 s); Mosaic configs are never compiled under a budget.

Env knobs: TD_BENCH_BATCH (default 16), TD_BENCH_ITERS (default 8),
TD_BENCH_W/TD_BENCH_H (default 4096x3000), TD_BENCH_COMPILE_BUDGET (seconds,
legacy name, default 240; set 0 to run ONE config in-process with no
budget/fallback - this is also how the round-end artifact build is done),
TD_BENCH_TOTAL_BUDGET (default 540), TD_BENCH_FAST=1 (denoise_overlap=2
speed preset - reported as the FULLFAST config, never the graded FULL line).

Note: on the axon TPU tunnel, block_until_ready() does not synchronize;
completion is fenced by materializing the small metrics output of the same
executable.
"""

import hashlib
import json
import os
import subprocess
import sys
import threading
import time

_PROC_T0 = time.time()
_MARKER_PATH = os.path.expanduser('~/.cache/tpu_darktable/bench_warm.json')
_CHILD_IDENTITY = None  # set by _bench_child for the in-process marker write

# Ladder configs: name -> env overrides.  FULL is the graded flagship
# configuration (all Pallas kernels on); BILAT16 drops only the RCD
# interior kernel but keeps the bilateral band kernel; XLA16 drops both;
# BANK additionally drops to batch 2 for the fastest possible cold compile.
# FULLFAST is FULL at the denoise_overlap=2 operating point (a reference-
# exposed quality/speed knob, reference denoise.py:26-32) - reported as an
# extra stderr line, never the graded metric.
_CONFIGS = {
    'FULL': {},
    'FULLFAST': {'TD_BENCH_FAST': '1'},
    'BILAT16': {'TD_RCD_PALLAS': '0'},
    'XLA16': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0'},
    'BANK': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0',
             'TD_BENCH_BATCH': '2'},
}

# Every env key any rung override touches (reset between rungs in the
# one-process ladder child).
_KNOB_KEYS = ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH',
              'TD_BENCH_FAST')

# Rungs whose program embeds Mosaic kernels: cold compiles measured at
# 531 s (FULL) / 485 s (BILAT16) inside the full program - never compiled
# under a ladder budget, only deserialized from an AOT artifact.
_ARTIFACT_GATED = ('FULL', 'FULLFAST', 'BILAT16')

# Expected wall seconds (fresh process, imports + compile/reload + timing)
# when no measured marker exists yet.  Used by _plan for ORDERING (bank the
# cheapest rung first).
_COLD_WALL = {'BANK': 80.0, 'XLA16': 150.0}
_ARTIFACT_WALL = {'BANK': 70.0}
_ARTIFACT_WALL_DEFAULT = 90.0

# Steady-state rung cost estimates for the one-process child, AFTER the
# first-execution anomaly has been paid by an earlier rung: artifact rungs
# are deserialize (4-13 s) + 5 warmups + timed iters; compile rungs are the
# measured in-process cold compiles (BANK 63.6 s / XLA16 307.8 s) plus
# execution.  The child skips a rung once a line is banked if the remaining
# global budget is below this.
_STEADY_AOT = {'BANK': 40.0, 'XLA16': 60.0, 'FULL': 80.0, 'FULLFAST': 70.0}
_STEADY_COMPILE = {'BANK': 110.0, 'XLA16': 350.0}


def _identity():
    """Hash of everything that keys a compiled program for this bench:
    package source, jax version, and the bench shape env knobs."""
    h = hashlib.sha256()
    try:
        import jax
        h.update(jax.__version__.encode())
    except Exception:
        pass
    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'tpu_darktable')
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs[:] = sorted(d for d in dirs if d != '__pycache__')
        for f in sorted(files):
            if f.endswith('.py'):
                p = os.path.join(root, f)
                h.update(f.encode())
                with open(p, 'rb') as fh:
                    h.update(fh.read())
    for k in ('TD_BENCH_BATCH', 'TD_BENCH_ITERS', 'TD_BENCH_W', 'TD_BENCH_H'):
        h.update(f'{k}={os.environ.get(k, "")};'.encode())
    return h.hexdigest()


def _program_identity(identity, config_name):
    """AOT artifact identity for one ladder rung: the code/shape identity
    plus every env knob that changes the traced program, with the rung's
    overrides applied."""
    env = dict(os.environ)
    env.update(_CONFIGS.get(config_name, {}))
    knobs = ';'.join(
        f'{k}={env.get(k, "")}'
        for k in ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_MAP_CHUNK',
                  'TD_BENCH_BATCH', 'TD_BENCH_FAST')
    )
    return f'{identity};config={config_name};{knobs}'


def _read_markers():
    try:
        with open(_MARKER_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _write_marker(config_name, identity, wall_s, source=''):
    try:
        os.makedirs(os.path.dirname(_MARKER_PATH), exist_ok=True)
        markers = _read_markers()
        markers[config_name] = {
            'identity': identity,
            'wall_s': round(float(wall_s), 1),
            'source': source,
        }
        with open(_MARKER_PATH, 'w') as f:
            json.dump(markers, f)
    except Exception as e:  # marker is an optimization, never fatal
        print(f'[bench] marker write failed: {e}', file=sys.stderr)


def _marker_wall(markers, name, identity):
    """(measured wall seconds, source) from a matching marker, else
    (None, None).  Legacy string-valued markers carry no measurement."""
    m = markers.get(name)
    if isinstance(m, dict) and m.get('identity') == identity:
        return m.get('wall_s'), m.get('source')
    return None, None


def _config_name_from_env():
    """Which ladder config the current env selects.  A hand-rolled env that
    matches no rung is stamped CUSTOM so its line (and marker) can never
    masquerade as a ladder config."""
    rcd = os.environ.get('TD_RCD_PALLAS', '1') != '0'
    bilat = os.environ.get('TD_BILATERAL_PALLAS', '1') != '0'
    batch2 = os.environ.get('TD_BENCH_BATCH') == '2'
    fast = os.environ.get('TD_BENCH_FAST') == '1'
    if fast:
        return 'FULLFAST' if (rcd and bilat and not batch2) else 'CUSTOM'
    if rcd and bilat and not batch2:
        return 'FULL'
    if not rcd and bilat and not batch2:
        return 'BILAT16'
    if not rcd and not bilat and not batch2:
        return 'XLA16'
    if not rcd and not bilat and batch2:
        return 'BANK'
    return 'CUSTOM'


def _note(msg):
    print(f'[bench] {time.strftime("%H:%M:%S")} +{time.time() - _PROC_T0:5.1f}s {msg}',
          file=sys.stderr, flush=True)


def _result_dict(fps, config, width, height):
    mp = width * height / 1e6
    # A non-flagship rung must not masquerade as the flagship number: the
    # config name rides both in the metric text and as its own key.
    if config == 'FULL':
        tag = ''
    elif config == 'FULLFAST':
        tag = ' [FULLFAST speed preset, ungraded]'
    else:
        tag = f' [{config} fallback config]'
    return {
        'metric': f'{mp:.0f}MP RAW->sRGB frames/sec (fused ISP: WB+RCD+postprocess+'
                  f'Wiener+bilateral+adaptive-ACES, single chip){tag}',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        # BASELINE.json target: >= 2000 fps on a v5e-8; the metric is
        # frames/sec/CHIP, so the per-chip baseline is 2000 / 8 = 250.
        'vs_baseline': round(fps / 250.0, 4),
        'config': config,
    }


def _time_rung(config, identity, require_aot):
    """Build/load and time one ladder config in THIS process.

    Assumes the config's env overrides are already applied (the caller owns
    env bookkeeping).  Returns (result_dict | None, source, warmup1_s):
    result is None when require_aot found no valid artifact.
    """
    import numpy as np
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn
    from tpu_darktable.utils import aot

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    iters = int(os.environ.get('TD_BENCH_ITERS', '8'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))
    program_identity = _program_identity(identity, config)

    _note(f'{config}: preparing (batch={batch}, {width}x{height})')
    if require_aot:
        _note(f'{config}: loading AOT artifact (required; no compile fallback)')
        compiled = aot.load(program_identity)
        if compiled is None:
            _note(f'{config}: AOT artifact missing/stale for this identity; '
                  'skipping (never compiling a Mosaic config under a budget)')
            return None, 'missing', 0.0
        source = 'aot'
    else:
        settings = ImageProcessingSettings(
            debayer=Debayer.rcd,
            postprocess=True,
            enable_denoise=True,
            enable_bilateral=True,
            tone_mapping=ToneMapper.adaptive_aces,
            tone_gamma=1.5,
            tone_intensity=2.0,
            light_adapt=0.8,
            vibrance=0.5,
        )
        if os.environ.get('TD_BENCH_FAST') == '1':
            settings = settings.model_copy(update={'denoise_overlap': 2})
        fn = build_pipeline_fn(
            settings, (width, height), td.BayerPattern.RGGB,
            td.PackedFormat.Packed12, True,
        )
        _note(f'{config}: AOT-first compile (artifact reload ~1-12 s; fresh '
              'compile can be minutes)')
        compiled, source = aot.load_or_compile(
            fn, _make_args(batch, width, height), program_identity)

    args = _make_args(batch, width, height)
    _note(f'{config}: executable ready (source={source}); warmup')
    # 5 warmup executions, matching the reference harness protocol
    # (reference scripts/run_benchmark.py:16-39: 5 warmup + timed iters).
    # One warmup is NOT enough here: the chip clock-ramps over the first
    # executions in a fresh process (first steady-state timing reads
    # 15-30% high - BASELINE.md "measurement hazard"); and the process's
    # very first device execution additionally pays the 130-400 s warmup
    # anomaly, timed separately below so the ladder can log it.
    t_w = time.perf_counter()
    out, b, m = compiled(*args)
    np.asarray(m)  # fence
    warmup1 = time.perf_counter() - t_w
    for _ in range(4):
        out, b, m = compiled(*args)
        np.asarray(m)  # fence
    _note(f'{config}: warmup done (first execution {warmup1:.1f}s), timing')

    # Throughput protocol: dispatch ALL timed iterations back-to-back (JAX
    # dispatch is async; the device executes them in order with no idle
    # gaps), then fence ONCE on a reduction over every iteration's metrics
    # output.  Fencing per iteration inserts a host<->device tunnel round
    # trip between dispatches, idling the device each time: measured
    # 24.2 ms/iter = 1.51 ms/frame at batch 16, FULL 18.43 -> 18.96 fps
    # (experiments/fence_probe.py, 4 interleaved reps, stable to 0.01).
    t0 = time.perf_counter()
    ms = []
    for _ in range(iters):
        out, b, m = compiled(*args)
        ms.append(m)
    np.asarray(jnp.stack(ms).sum(0))  # one fence over all iterations
    dt = (time.perf_counter() - t0) / (iters * batch)
    fps = 1.0 / dt
    _note(f'{config}: done, {fps:.2f} fps')
    del compiled, args, out, b, m
    return _result_dict(fps, config, width, height), source, warmup1


def _make_args(batch, width, height):
    import numpy as np
    import jax.numpy as jnp

    n_bytes = height * width * 3 // 2
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], dtype=jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)
    return (data, wb, bounds, metrics, alpha)


def _bench_child():
    """Single-config in-process run (``--child``): used by the round-end
    artifact build and by TD_BENCH_COMPILE_BUDGET=0 manual runs.  Prints the
    JSON line to stdout."""
    config = _config_name_from_env()
    # Stash the identity for the in-process marker write: recomputing it
    # after the run would desync marker and artifact if a source file
    # changed while the (multi-minute) compile ran.  A ladder parent passes
    # its own identity down so planning and loading agree on one snapshot.
    global _CHILD_IDENTITY
    _CHILD_IDENTITY = identity = (
        os.environ.get('TD_BENCH_CODE_IDENTITY') or _identity())
    require_aot = os.environ.get('TD_AOT_REQUIRE') == '1'
    result, source, _ = _time_rung(config, identity, require_aot)
    if result is None:
        return 7
    print(json.dumps(result))
    return 0


def _child_skip_reason(name, banked, remaining, has_artifact):
    """Why the one-process ladder child should skip this rung, or None.

    Pure so the suite can pin it: FULLFAST only ever runs as FULL's extra;
    once the flagship is banked nothing else is graded; and once ANY line
    is banked a rung only runs if the remaining global budget covers its
    steady-state estimate (the first rung always runs - there is nothing
    to protect yet, and it is the one that eats the warmup anomaly)."""
    if name == 'FULLFAST':
        if 'FULL' not in banked:
            return 'FULLFAST is the post-FULL extra; FULL is not banked'
    elif 'FULL' in banked:
        return 'flagship already banked'
    if name in banked:
        return 'already banked'
    if banked:
        est = (_STEADY_AOT.get(name, 80.0) if has_artifact
               else _STEADY_COMPILE.get(name, 400.0))
        if remaining < est:
            return (f'{remaining:.0f}s remaining < {est:.0f}s steady-state '
                    'estimate')
    return None


def _ladder_child():
    """Run the WHOLE ladder in this one process (``--child-ladder``).

    The first device execution pays the warmup anomaly exactly once (during
    the banking rung); every later rung runs at steady-state cost.  Each
    banked rung is appended to TD_BENCH_RESULTS (flushed per line) so a
    parent kill can never lose a banked number; stdout stays empty (the
    parent owns the graded line)."""
    plan = json.loads(os.environ['TD_BENCH_PLAN'])
    global _CHILD_IDENTITY
    _CHILD_IDENTITY = identity = (
        os.environ.get('TD_BENCH_CODE_IDENTITY') or _identity())
    budget = float(os.environ.get('TD_BENCH_CHILD_BUDGET', '540'))
    results_path = os.environ['TD_BENCH_RESULTS']
    base_env = {k: os.environ.get(k) for k in _KNOB_KEYS}

    banked = set()
    for name, require_aot, has_artifact in plan:
        remaining = budget - (time.time() - _PROC_T0)
        reason = _child_skip_reason(name, banked, remaining, has_artifact)
        if reason is not None:
            _note(f'{name}: skipped ({reason})')
            continue
        # Apply this rung's env overrides from a clean base (knobs are read
        # at trace time, so one process can build every rung's program).
        for k in _KNOB_KEYS:
            if base_env[k] is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = base_env[k]
        os.environ.update(_CONFIGS[name])
        t_rung = time.monotonic()
        try:
            result, source, warmup1 = _time_rung(name, identity, require_aot)
        except Exception as e:
            _note(f'{name}: failed ({type(e).__name__}: {e})')
            continue
        finally:
            import gc
            gc.collect()  # drop the rung's device buffers before the next
        if result is None:
            continue
        banked.add(name)
        entry = {
            'config': name,
            'result': result,
            'wall_s': round(time.monotonic() - t_rung, 1),
            'source': source,
            'warmup1_s': round(warmup1, 1),
        }
        with open(results_path, 'a') as fh:
            fh.write(json.dumps(entry) + '\n')
            fh.flush()
            os.fsync(fh.fileno())
    return 0 if banked else 1


def _plan(markers, identity, artifacts, full_budget):
    """Ladder for the current artifact/marker state.

    ``artifacts`` is the set of rung names whose AOT artifact FILE exists
    for the current program identity (verified by the caller, not vouched
    for by a marker).  Returns ordered [(name, budget_s, require_aot)]:
    the cheapest available rung first (bank a real line), then FULL
    immediately (it either reloads its artifact in seconds or is skipped -
    never an unboundable compile), with the remaining XLA-only rungs as
    post-FULL fallbacks.  Putting a multi-minute cold compile BETWEEN the
    banked line and the flagship would only shrink FULL's budget (r3
    lesson); on success the runner stops grading at FULL anyway.  BILAT16
    shares FULL's identity scheme, so its artifact can never be valid when
    FULL's is not - it is not planned (manual TD_BILATERAL_PALLAS runs
    still stamp it correctly).  The per-rung budgets are advisory (the
    one-process runner enforces one global budget); they remain the
    measured-wall record for ordering.
    """
    def wall(name):
        w, source = _marker_wall(markers, name, identity)
        if name in artifacts:
            # A wall measured on a COMPILE run overstates the next run by
            # the compile time once the artifact exists; only an aot-sourced
            # measurement transfers.
            if w and source == 'aot':
                return float(w)
            return _ARTIFACT_WALL.get(name, _ARTIFACT_WALL_DEFAULT)
        if w:
            return float(w)
        return _COLD_WALL[name]

    candidates = ['BANK', 'XLA16'] + (['FULL'] if 'FULL' in artifacts else [])
    first = min(candidates, key=wall)
    order = [first]
    if 'FULL' in artifacts and first != 'FULL':
        order.append('FULL')
    # Post-FULL fallbacks (reached only if FULL failed or is unavailable),
    # cheapest first so a line is banked before the expensive one.
    order += sorted((n for n in ('BANK', 'XLA16') if n != first), key=wall)

    plan = []
    for name in order:
        budget = min(600.0, 2.5 * wall(name) + 30.0)
        if name == 'FULL' and full_budget > budget:
            budget = full_budget  # spend whatever the caller allows on FULL
        plan.append((name, budget, name in _ARTIFACT_GATED))
    return plan


def _build_artifacts(names):
    """Round-end artifact build: compile the named rungs (default: every
    ladder rung) in-process children and serialize their executables into
    the repo's committed artifact dir (artifacts/aot), so a fresh driver
    host reloads them in seconds instead of compiling for minutes.

    Children run SERIALLY (the TPU device silently serializes concurrent
    processes) with the parent's identity pinned, because the rung env
    overrides (e.g. TD_BENCH_BATCH=2) must not leak into the identity hash
    the driver will compute under a default env.
    """
    names = [n.upper() for n in names if not n.startswith('-')] or \
        ['BANK', 'XLA16', 'FULL', 'FULLFAST']
    bad = [n for n in names if n not in _CONFIGS]
    if bad:
        print(f'[bench] unknown configs: {bad}', file=sys.stderr)
        return 2
    identity = _identity()
    repo_aot = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'artifacts', 'aot')
    print(f'[bench] building artifacts for {names} (identity '
          f'{identity[:12]}) into {repo_aot}', file=sys.stderr, flush=True)
    failures = []
    for name in names:
        env = dict(os.environ)
        env.update(_CONFIGS[name])
        env['TD_BENCH_CODE_IDENTITY'] = identity
        env['TD_AOT_DIR'] = repo_aot  # save straight into the committed dir
        env.pop('TD_AOT_REQUIRE', None)
        t0 = time.monotonic()
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child'],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(res.stderr)
        wall = time.monotonic() - t0
        if res.returncode == 0:
            _write_marker(name, identity, wall, 'inproc')
            # The child may have LOADED a pre-existing per-host artifact
            # instead of compiling (load_or_compile only saves on compile);
            # make sure a copy lands in the committed dir either way.
            from tpu_darktable.utils import aot
            pid = _program_identity(identity, name)
            found = aot.find_artifact(pid)
            want = os.path.join(repo_aot, f'{aot.aot_key(pid)}.aotexe')
            if found is not None and os.path.abspath(found) != os.path.abspath(want):
                import shutil
                os.makedirs(repo_aot, exist_ok=True)
                shutil.copyfile(found, want)
                print(f'[bench] {name}: copied {found} -> {want}',
                      file=sys.stderr, flush=True)
            line = next((ln for ln in reversed(res.stdout.splitlines())
                         if ln.startswith('{')), '')
            print(f'[bench] {name}: built in {wall:.0f}s  {line}',
                  file=sys.stderr, flush=True)
        else:
            failures.append(name)
            print(f'[bench] {name}: FAILED rc={res.returncode}',
                  file=sys.stderr, flush=True)
    return 1 if failures else 0


def _read_results(path):
    entries = []
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        entries.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass  # partial tail line from a mid-write kill
    except OSError:
        pass
    return entries


def _graded_entry(entries):
    """The entry whose JSON line is the graded stdout: FULL if banked,
    else the best value among non-FULLFAST rungs (the ov=2 speed preset is
    never the graded metric)."""
    full = [e for e in entries if e.get('config') == 'FULL']
    if full:
        return full[-1]
    rest = [e for e in entries if e.get('config') != 'FULLFAST']
    if not rest:
        return None
    return max(rest, key=lambda e: e.get('result', {}).get('value', 0.0))


def main():
    budget = float(os.environ.get('TD_BENCH_COMPILE_BUDGET', '240'))
    if '--child' in sys.argv:
        return _bench_child()
    if '--child-ladder' in sys.argv:
        return _ladder_child()
    if '--build-artifacts' in sys.argv:
        return _build_artifacts(sys.argv[sys.argv.index('--build-artifacts') + 1:])
    if budget <= 0:
        # In-process single-config run (round-end artifact build): no
        # budget/fallback; record the measured wall for the env's config.
        rc = _bench_child()
        if rc == 0:
            _write_marker(_config_name_from_env(), _CHILD_IDENTITY,
                          time.time() - _PROC_T0, source='inproc')
        return rc

    from tpu_darktable.utils import aot  # pure-hash path: no jax import

    identity = _identity()
    markers = _read_markers()
    # Check every rung's artifact (not just the gated ones): XLA-only rungs
    # also reload in seconds when their artifact rides with the repo, which
    # tightens their wall estimate and the banking choice.
    artifacts = {
        name for name in _CONFIGS
        if aot.find_artifact(_program_identity(identity, name)) is not None
    }
    plan = [(name, gated, name in artifacts)
            for name, _, gated in _plan(markers, identity, artifacts,
                                        full_budget=budget)]
    if 'FULLFAST' in artifacts:
        plan.append(('FULLFAST', True, True))
    total_budget = float(os.environ.get('TD_BENCH_TOTAL_BUDGET', '540'))
    print(f'[bench] artifacts present: {sorted(artifacts) or "none"}; '
          f'plan: {[n for n, _, _ in plan]}; total budget {total_budget:.0f}s',
          file=sys.stderr, flush=True)

    results_path = f'/tmp/td_bench_results.{os.getpid()}.jsonl'
    try:
        os.unlink(results_path)
    except OSError:
        pass
    env = dict(os.environ)
    env['TD_BENCH_CODE_IDENTITY'] = identity
    env['TD_BENCH_PLAN'] = json.dumps(plan)
    env['TD_BENCH_RESULTS'] = results_path
    env['TD_BENCH_CHILD_BUDGET'] = str(total_budget - 10.0)

    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--child-ladder'],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )
    # Stream the child's progress notes live (driver logs show where time
    # went even if the run is killed externally).
    def _pump():
        for line in child.stderr:
            sys.stderr.write(line)
            sys.stderr.flush()
    pump = threading.Thread(target=_pump, daemon=True)
    pump.start()

    # Tail the results file while the child runs: the graded line goes out
    # THE MOMENT the flagship banks, so nothing after that point (the
    # FULLFAST extra, a driver kill, the total budget) can cost the round
    # its number.
    t_start = time.monotonic()
    graded_printed = False
    reported = set()

    def _emit(entries):
        nonlocal graded_printed
        for e in entries:
            key = e.get('config')
            if key in reported:
                continue
            reported.add(key)
            _write_marker(key, identity, e.get('wall_s', 0.0),
                          e.get('source', ''))
            if key == 'FULLFAST':
                print(f'[bench] FULLFAST (ungraded ov=2 speed preset): '
                      f'{json.dumps(e["result"])}', file=sys.stderr, flush=True)
            elif key == 'FULL' and not graded_printed:
                print(json.dumps(e['result']), flush=True)
                graded_printed = True

    while child.poll() is None:
        _emit(_read_results(results_path))
        if time.monotonic() - t_start > total_budget:
            print(f'[bench] total budget {total_budget:.0f}s exhausted; '
                  'killing the ladder child', file=sys.stderr, flush=True)
            child.kill()
            break
        time.sleep(1.0)
    child.wait()
    pump.join(timeout=5.0)
    entries = _read_results(results_path)
    _emit(entries)
    try:
        os.unlink(results_path)
    except OSError:
        pass

    if not graded_printed:
        best = _graded_entry(entries)
        if best is None:
            print('[bench] all attempts failed', file=sys.stderr, flush=True)
            return 1
        print(json.dumps(best['result']), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
