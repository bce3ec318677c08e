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
    fresh process deserializes the flagship program in ~1 s instead of
    recompiling.  Artifacts committed under artifacts/aot/ ride with the
    code to fresh hosts.
  * The ladder checks the artifact FILE for the exact program identity
    before planning a rung (not a marker's word for it), budgets each rung
    from the last measured wall time (x2.5 + margin), and always banks the
    cheapest available rung first so a real JSON line exists before any
    gamble.  FULL runs IMMEDIATELY after the banking rung with
    TD_AOT_REQUIRE=1: it either reloads its artifact in ~1 s or exits in
    seconds (missing/stale artifact) - never an unboundable compile.  The
    XLA-only rungs left over are post-FULL fallbacks, reached only when
    FULL failed.
  * Rungs without an artifact (BANK, XLA16) are XLA-only programs whose
    cold compile fits a ladder budget; FULL/FULLFAST/BILAT16 carry Mosaic
    kernels (531 s / 485 s measured cold in-program) and are
    artifact-gated.  After a successful FULL, the FULLFAST rung (ov=2
    speed preset) is also run if its artifact is present and budget
    remains - its line goes to stderr, never the graded stdout.
  * ``python bench.py --build-artifacts [RUNGS...]`` is the round-end
    build: compiles each rung in-process (no budget) and serializes the
    executables into the committed artifacts/aot/ dir.

Budget story: warm happy path (artifacts present) is one cheap rung plus
one FULL rung, ~100-150 s total.  Worst case is bounded by
TD_BENCH_TOTAL_BUDGET (default 540 s): cold rungs bank a line first
(~80-200 s), and FULL - which can only execute, never compile, under its
artifact gate - then gets everything that remains (first executions in a
fresh process have measured 100-300 s warmup anomalies on this tunnel).
The graded stdout line is flushed the moment FULL banks, before the
ungraded FULLFAST extra runs.

Env knobs: TD_BENCH_BATCH (default 16), TD_BENCH_ITERS (default 8),
TD_BENCH_W/TD_BENCH_H (default 4096x3000), TD_BENCH_COMPILE_BUDGET (seconds,
default 240; set 0 to run in-process with no budget/fallback - this is also
how the round-end artifact build is done), TD_BENCH_TOTAL_BUDGET (default
540), TD_BENCH_FAST=1 (denoise_overlap=2 speed preset - reported as the
FULLFAST config, never the graded FULL line).

Note: on the axon TPU tunnel, block_until_ready() does not synchronize;
completion is fenced by materializing the small metrics output of the same
executable.
"""

import hashlib
import json
import os
import subprocess
import sys
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

# Rungs whose program embeds Mosaic kernels: cold compiles measured at
# 531 s (FULL) / 485 s (BILAT16) inside the full program - never compiled
# under a ladder budget, only deserialized from an AOT artifact.
_ARTIFACT_GATED = ('FULL', 'FULLFAST', 'BILAT16')

# Expected wall seconds (fresh process, imports + compile/reload + timing)
# when no measured marker exists yet.
_COLD_WALL = {'BANK': 80.0, 'XLA16': 150.0}
# With an artifact: deserialize ~1 s; imports + inputs + warmup + timing
# dominate (batch-2 BANK does far less device work per run).  Estimates
# must absorb the ~137 s first-execution anomaly AOT-loaded processes pay
# on this tunnel (processes that spend minutes compiling warm the device
# during the compile and never show it; artifact loads skip straight to
# execution and eat it in the first warmup - two rehearsals measured BANK
# killed at 139/142 s and a FULL warmup of 137 s that its wider budget
# absorbed).
_ARTIFACT_WALL = {'BANK': 70.0}
_ARTIFACT_WALL_DEFAULT = 90.0


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


def _bench_child():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn
    from tpu_darktable.utils import aot

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    iters = int(os.environ.get('TD_BENCH_ITERS', '8'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))
    config = _config_name_from_env()
    # Stash the identity for the in-process marker write: recomputing it
    # after the run would desync marker and artifact if a source file
    # changed while the (multi-minute) compile ran.  A ladder parent passes
    # its own identity down so planning and loading agree on one snapshot.
    global _CHILD_IDENTITY
    _CHILD_IDENTITY = identity = (
        os.environ.get('TD_BENCH_CODE_IDENTITY') or _identity())
    program_identity = _program_identity(identity, config)

    def note(msg):
        print(f'[bench] {time.strftime("%H:%M:%S")} +{time.time() - _PROC_T0:5.1f}s {msg}',
              file=sys.stderr, flush=True)

    note(f'building pipeline (config={config}, batch={batch}, {width}x{height})')
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
        settings, (width, height), td.BayerPattern.RGGB, td.PackedFormat.Packed12, True
    )

    n_bytes = height * width * 3 // 2
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], dtype=jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)
    args = (data, wb, bounds, metrics, alpha)

    if os.environ.get('TD_AOT_REQUIRE') == '1':
        note('loading AOT artifact (required; no compile fallback)')
        compiled = aot.load(program_identity)
        if compiled is None:
            note('AOT artifact missing/stale for this identity; bailing fast '
                 'so the ladder can move on')
            return 7
        source = 'aot'
    else:
        note('AOT-first compile (artifact reload ~1s; fresh compile can be minutes)')
        compiled, source = aot.load_or_compile(fn, args, program_identity)
    note(f'executable ready (source={source}); warmup')
    # 5 warmup executions, matching the reference harness protocol
    # (reference scripts/run_benchmark.py:16-39: 5 warmup + timed iters).
    # One warmup is NOT enough here: the chip clock-ramps over the first
    # executions in a fresh process (first steady-state timing reads
    # 15-30% high - BASELINE.md "measurement hazard"), so a single-warmup
    # timing loop eats the ramp in its first iteration.
    for _ in range(5):
        out, b, m = compiled(*args)
        np.asarray(m)  # fence
    note('warmup done, timing')

    t0 = time.perf_counter()
    for _ in range(iters):
        out, b, m = compiled(*args)
        np.asarray(m)  # fence: same executable, tiny transfer
    dt = (time.perf_counter() - t0) / (iters * batch)

    fps = 1.0 / dt
    mp = width * height / 1e6
    # A fallback rung must not masquerade as the flagship number: the
    # config name rides both in the metric text and as its own key.
    tag = '' if config == 'FULL' else f' [{config} fallback config]'
    result = {
        'metric': f'{mp:.0f}MP RAW->sRGB frames/sec (fused ISP: WB+RCD+postprocess+'
                  f'Wiener+bilateral+adaptive-ACES, single chip){tag}',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        # BASELINE.json target: >= 2000 fps on a v5e-8; the metric is
        # frames/sec/CHIP, so the per-chip baseline is 2000 / 8 = 250.
        'vs_baseline': round(fps / 250.0, 4),
        'config': config,
    }
    print(json.dumps(result))
    note(f'done: {fps:.2f} fps ({config})')
    return 0


def _plan(markers, identity, artifacts, full_budget):
    """Ladder for the current artifact/marker state.

    ``artifacts`` is the set of rung names whose AOT artifact FILE exists
    for the current program identity (verified by the caller, not vouched
    for by a marker).  Returns ordered [(name, budget_s, require_aot)]:
    the cheapest available rung first (bank a real line), then FULL
    immediately (it either reloads its artifact in ~1 s or bails in
    seconds under TD_AOT_REQUIRE=1 - never an unboundable compile), with
    the remaining XLA-only rungs as post-FULL fallbacks.  Putting a
    multi-minute cold compile BETWEEN the banked line and the flagship
    would only shrink FULL's budget (r3 lesson); on success the runner
    stops at FULL anyway.  BILAT16 shares FULL's identity scheme, so its
    artifact can never be valid when FULL's is not - it is not planned
    (manual TD_BILATERAL_PALLAS runs still stamp it correctly).
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
    host reloads them in ~1 s instead of compiling for minutes.

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


def _run_child(name, timeout_s, require_aot, identity):
    """Run one ladder rung in a child process.  Returns (rc, json_line,
    wall_s, aot_sourced); rc=-1 on timeout."""
    overrides = dict(_CONFIGS[name])
    if require_aot:
        overrides['TD_AOT_REQUIRE'] = '1'
    env = dict(os.environ)
    env.update(overrides)
    env['TD_BENCH_CODE_IDENTITY'] = identity
    t_child = time.monotonic()
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child'],
            env=env, timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as e:
        print(f'[bench] {name} exceeded {timeout_s:.0f}s budget, killed',
              file=sys.stderr, flush=True)
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else e.stderr.decode(
                'utf-8', 'replace')
            sys.stderr.write(err)
        return -1, None, time.monotonic() - t_child, False
    sys.stderr.write(res.stderr)
    line = next(
        (ln for ln in reversed(res.stdout.splitlines())
         if ln.startswith('{') and '"value"' in ln),
        None,
    )
    return (res.returncode, line, time.monotonic() - t_child,
            '(source=aot)' in res.stderr)


def main():
    budget = float(os.environ.get('TD_BENCH_COMPILE_BUDGET', '240'))
    if '--child' in sys.argv:
        return _bench_child()
    if '--build-artifacts' in sys.argv:
        return _build_artifacts(sys.argv[sys.argv.index('--build-artifacts') + 1:])
    if budget <= 0:
        # In-process run (round-end artifact build): no budget/fallback;
        # record the measured wall for the config the env selects.
        rc = _bench_child()
        if rc == 0:
            _write_marker(_config_name_from_env(), _CHILD_IDENTITY,
                          time.time() - _PROC_T0, source='inproc')
        return rc

    from tpu_darktable.utils import aot  # pure-hash path: no jax import

    identity = _identity()
    markers = _read_markers()
    # Check every rung's artifact (not just the gated ones): XLA-only rungs
    # also reload in ~1 s when their artifact rides with the repo, which
    # tightens their wall estimate and the banking choice.
    artifacts = {
        name for name in _CONFIGS
        if aot.find_artifact(_program_identity(identity, name)) is not None
    }
    plan = _plan(markers, identity, artifacts, full_budget=budget)
    print(f'[bench] artifacts present: {sorted(artifacts) or "none"}; '
          f'plan: {[(n, int(b)) for n, b, _ in plan]}', file=sys.stderr, flush=True)

    total_budget = float(os.environ.get('TD_BENCH_TOTAL_BUDGET', '540'))
    t_start = time.monotonic()
    best = None  # (value, line)
    full_banked = False
    for i, (name, timeout_s, require_aot) in enumerate(plan, 1):
        elapsed = time.monotonic() - t_start
        remaining = total_budget - elapsed
        if name == 'FULL' and require_aot:
            # An artifact-gated FULL never compiles (a stale artifact bails
            # in seconds), so the budget only bounds execution.  Spend
            # everything left: first executions in a fresh process have
            # measured 100-300 s warmup anomalies on this tunnel (a BANK
            # warmup once sat >139 s; FULLFAST's took 283 s after a ~1 s
            # artifact reload), and a killed FULL costs the whole round
            # its flagship number.
            timeout_s = max(timeout_s, remaining)
        elif best is not None and timeout_s > remaining:
            print(f'[bench] skipping {name}: {elapsed:.0f}s elapsed + '
                  f'{timeout_s:.0f}s budget exceeds total {total_budget:.0f}s',
                  file=sys.stderr, flush=True)
            continue
        print(f'[bench] attempt {i}/{len(plan)} {name} '
              f'{_CONFIGS[name] or "(default)"} budget {timeout_s:.0f}s',
              file=sys.stderr, flush=True)
        rc, line, wall, aot_sourced = _run_child(name, timeout_s, require_aot,
                                                 identity)
        if rc == 0 and line:
            _write_marker(name, identity, wall,
                          'aot' if aot_sourced else 'compiled')
            value = json.loads(line).get('value', 0.0)
            if best is None or value > best[0]:
                best = (value, line)
            if name == 'FULL':
                full_banked = True
                break  # flagship config measured; nothing better to try
        elif rc != -1:
            print(f'[bench] attempt {i} ({name}) failed rc={rc}',
                  file=sys.stderr, flush=True)

    if best is None:
        print('[bench] all attempts failed', file=sys.stderr, flush=True)
        return 1
    # The graded line goes out the moment it exists: anything after this
    # point (the ungraded FULLFAST extra) must not be able to cost it.
    print(best[1], flush=True)
    # VERDICT r3 item 6: report the denoise_overlap=2 operating point
    # alongside the flagship line.  stderr only - NEVER the graded metric.
    remaining = total_budget - (time.monotonic() - t_start)
    if full_banked and 'FULLFAST' in artifacts and remaining >= 120.0:
        rc, line, wall, aot_sourced = _run_child(
            'FULLFAST', remaining, require_aot=True, identity=identity)
        if rc == 0 and line:
            _write_marker('FULLFAST', identity, wall,
                          'aot' if aot_sourced else 'compiled')
            print(f'[bench] FULLFAST (ungraded ov=2 speed preset): {line}',
                  file=sys.stderr, flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
