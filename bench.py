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
    tunnel (measured 49-527 s across sessions - BASELINE.md "first-
    execution anomaly"); per-rung child processes each paid it, and a
    >360 s anomaly on one host blew FULL's per-rung budget even though
    the artifact loaded in 12 s.  One process pays the anomaly exactly
    once, and (round 5) pays it CONCURRENTLY with setup: the ladder
    child's first action dispatches a trivial device op on a background
    thread, so the anomaly elapses while imports, artifact
    deserialization, and input-buffer transfers proceed on the host.
    Every rung after the first runs on a warmed device at steady-state
    cost (~30-70 s).
  * The banking rung is NEVER the flagship (round 5; BENCH_r04 lesson).
    Marker walls are not anomaly-comparable across rungs - a wall
    measured on the rung that paid the anomaly overstates its next run,
    one measured after another rung paid it understates a banking run -
    so rungs are ordered on the anomaly-EXCLUSIVE steady wall
    (wall_s - warmup1_s, both persisted per marker) and FULL always runs
    second, after a cheap XLA-only rung banked a real line.
  * The child appends each banked rung to a results file, flushed per
    line; the parent tails it while the child runs and prints the graded
    stdout line THE MOMENT the flagship banks (a later kill - the
    driver's or the total budget's - can no longer cost the round its
    number).  After a successful FULL, the FULLFAST rung (ov=2 speed
    preset) runs if its artifact is present and budget remains - its
    line goes to stderr, never the graded stdout.
  * Budget expiry policy (round 5; BENCH_r04 died 3-10 s short, and a
    cold tunnel measured 779-1040 s anomalies - past ANY self-budget):
    with NOTHING banked the parent never self-kills (a kill guarantees a
    zero; rc=124-with-no-line equals rc=1-with-no-line, so waiting for
    the external timeout risks nothing).  With a fallback banked it
    grants one TD_BENCH_GRACE (60 s) when a rung is mid-timing, and one
    TD_BENCH_FULL_WINDOW (150 s) when the flagship can still bank from
    its artifact; then it prints the best banked line and kills.  The
    child likewise credits the measured prewarm anomaly wall against its
    budget (the budget bounds our work, not the tunnel's one-off stall).
    Whenever FULL can no longer bank (artifact missing, run failed, kill
    imminent), the best already-banked fallback line is printed
    IMMEDIATELY, and a SIGTERM/SIGINT handler prints it before dying -
    an external kill of the parent finds a real JSON line on stdout.
  * ``python bench.py --build-artifacts [RUNGS...]`` is the round-end
    build: compiles each rung in-process (no budget) and serializes the
    executables into the committed artifacts/aot/ dir.

Budget story: TD_BENCH_TOTAL_BUDGET (default 540 s) bounds the ladder's
OWN work (anomaly-exclusive); the first-execution anomaly measured
7-1040 s across tunnel sessions (BENCH_r04's fatal draw was 527 s;
round 5 measured 779/1040 s on a cold tunnel) and is excluded on both
sides: the child credits its measured prewarm wall, the parent waits
past expiry while nothing is banked.  Round-5 controlled measurement
(BASELINE.md "idle-reconnection stall"): the stall tracks the idle gap
since the last TPU process exited (~1:1 short, saturating ~4-6 min;
killed-mid-stall processes carry their unfinished stall over), so a
driver run minutes after the round should expect minutes of stall -
waited out, never fatal.  The serial path after the anomaly
is setup + BANK timing + FULL reload/warmup/timing at steady cost
(~40-80 s), far inside budget.  Cold hosts without artifacts bank a
compiled XLA-only line instead (~80-340 s); Mosaic configs are never
compiled under a budget.

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
import re
import subprocess
import sys
import threading
import time

_PROC_T0 = time.time()
_MARKER_PATH = os.path.expanduser('~/.cache/tpu_darktable/bench_warm.json')
_CHILD_IDENTITY = None  # set by _bench_child for the in-process marker write
_CHILD_WARMUP1 = None   # first-execution wall, for the in-process marker

# Ladder configs: name -> env overrides.  FULL is the graded flagship
# configuration (all Pallas kernels on); XLA16 drops both Pallas kernels;
# BANK additionally drops to batch 2 for the fastest possible cold compile.
# FULLFAST is FULL at the denoise_overlap=2 operating point (a reference-
# exposed quality/speed knob, reference denoise.py:26-32) - reported as an
# extra stderr line, never the graded metric.  (A BILAT16 rung - RCD
# kernel off, bilateral kernel on - existed through round 4 but was never
# reachable by the ladder; deleted per VERDICT r4 weak #6.)
_CONFIGS = {
    'FULL': {},
    'FULLFAST': {'TD_BENCH_FAST': '1'},
    'XLA16': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0'},
    'BANK': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0',
             'TD_BENCH_BATCH': '2'},
}

# Every env key any rung override touches (reset between rungs in the
# one-process ladder child).
_KNOB_KEYS = ('TD_RCD_PALLAS', 'TD_BILATERAL_PALLAS', 'TD_BENCH_BATCH',
              'TD_BENCH_FAST')

# Rungs whose program embeds Mosaic kernels: cold compiles measured at
# 531 s (FULL) / 485 s (bilateral-only) inside the full program - never
# compiled under a ladder budget, only deserialized from an AOT artifact.
_ARTIFACT_GATED = ('FULL', 'FULLFAST')

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

# Parent-side parsing of the child's streamed notes (grace window + early
# fallback).  "warmup done ... timing" means the rung's timing loop is in
# flight - seconds from banking; "done,"/"failed" settles it.  FULL is dead
# (can never bank this run) once its artifact is missing or its run failed.
_TIMING_RE = re.compile(r'(\w+): warmup done')
_SETTLED_RE = re.compile(r'(\w+): (?:done,|failed )')
_FULL_DEAD_RE = re.compile(r'FULL: (?:failed |skipped \(|AOT artifact missing)')
_PREWARM_RE = re.compile(r'prewarm: first device execution fenced|prewarm failed')


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


def _write_marker(config_name, identity, wall_s, source='', warmup1_s=None):
    try:
        os.makedirs(os.path.dirname(_MARKER_PATH), exist_ok=True)
        markers = _read_markers()
        entry = {
            'identity': identity,
            'wall_s': round(float(wall_s), 1),
            'source': source,
        }
        if warmup1_s is not None:
            # First-execution wall (anomaly + one execution): persisting it
            # lets _plan score rungs on the anomaly-EXCLUSIVE steady wall.
            # Walls without it are not comparable across rungs (the r4
            # poisoning: BANK's wall included the anomaly, FULL's did not).
            entry['warmup1_s'] = round(float(warmup1_s), 1)
        markers[config_name] = entry
        with open(_MARKER_PATH, 'w') as f:
            json.dump(markers, f)
    except Exception as e:  # marker is an optimization, never fatal
        print(f'[bench] marker write failed: {e}', file=sys.stderr)


def _marker_wall(markers, name, identity):
    """(measured wall seconds, first-execution seconds, source) from a
    matching marker, else (None, None, None).  Legacy string-valued markers
    carry no measurement; legacy dict markers may lack warmup1_s."""
    m = markers.get(name)
    if isinstance(m, dict) and m.get('identity') == identity:
        return m.get('wall_s'), m.get('warmup1_s'), m.get('source')
    return None, None, None


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
    args = _make_args(batch, width, height)
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
        # One args tuple serves lowering AND timing: building it twice
        # transferred the ~300 MB batch-16 input buffers twice inside the
        # rung's budgeted wall (ADVICE r4).
        compiled, source = aot.load_or_compile(fn, args, program_identity)

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
    # Warm the timed loop's fence program too: the one-fence reduction
    # below (stack of `iters` metrics) is its own jitted program that would
    # otherwise compile INSIDE the timed region on the rung's first timed
    # loop, deflating the graded fps (ADVICE r4 medium).
    np.asarray(jnp.stack([m] * iters).sum(0))
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
    global _CHILD_IDENTITY, _CHILD_WARMUP1
    _CHILD_IDENTITY = identity = (
        os.environ.get('TD_BENCH_CODE_IDENTITY') or _identity())
    require_aot = os.environ.get('TD_AOT_REQUIRE') == '1'
    result, source, _CHILD_WARMUP1 = _time_rung(config, identity, require_aot)
    if result is None:
        return 7
    print(json.dumps(result))
    return 0


def _child_skip_reason(name, banked, remaining, has_artifact, attempted=0):
    """Why the one-process ladder child should skip this rung, or None.

    Pure so the suite can pin it: FULLFAST only ever runs as FULL's extra;
    once the flagship is banked nothing else is graded; and once any rung
    has been ATTEMPTED (banked or failed - ADVICE r4: a failed first rung
    must not hand a 350 s cold compile an unchecked budget), a rung only
    runs if the remaining global budget covers its steady-state estimate.
    The very first rung always runs - there is nothing to protect yet, and
    the prewarm dispatch (not any particular rung) eats the warmup anomaly
    on behalf of the whole ladder.  And the flagship is NEVER budget-
    skipped while its artifact exists: a FULL-from-artifact attempt is
    bounded (~40-80 s load+warmup+timing), any banked fallback is already
    flush-protected against a kill, and the parent grants it a window past
    expiry - a child-side skip would just forfeit the graded line the
    parent is explicitly waiting for (found by the round-5 tiny-budget
    overtime exercise: parent granted the FULL window, child had already
    skipped on '-10s remaining')."""
    if name == 'FULLFAST':
        if 'FULL' not in banked:
            return 'FULLFAST is the post-FULL extra; FULL is not banked'
    elif 'FULL' in banked:
        return 'flagship already banked'
    if name in banked:
        return 'already banked'
    if name == 'FULL' and has_artifact:
        return None
    if banked or attempted:
        est = (_STEADY_AOT.get(name, 80.0) if has_artifact
               else _STEADY_COMPILE.get(name, 400.0))
        if remaining < est:
            return (f'{remaining:.0f}s remaining < {est:.0f}s steady-state '
                    'estimate')
    return None


_PREWARM_WALL = None  # seconds to the prewarm fence, once it lands


def _prewarm_device():
    """Pay the first-execution anomaly concurrently with host-side setup.

    The anomaly is program-INDEPENDENT (BASELINE.md round 4: a bare
    600x800 op chain stalled 136 s on first dispatch, same as the full
    pipeline's 137.8 s), so a trivial dispatch fired as the ladder child's
    first action starts the device-side stall immediately; imports,
    artifact deserialization, and input transfers then overlap it instead
    of serializing behind it inside the banking rung's first warmup.  Runs
    on a daemon thread; the fence blocks the thread, never the ladder.

    The fence wall is recorded in _PREWARM_WALL: it measures the anomaly
    itself, which the child CREDITS against its budget (the budget bounds
    OUR work, not the tunnel's unboundable one-off stall - round 5
    measured 779-1040 s anomalies on a cold tunnel, past any budget)."""
    global _PREWARM_WALL
    t0 = time.perf_counter()
    try:
        import numpy as np
        import jax.numpy as jnp

        np.asarray(jnp.zeros((8, 128), jnp.float32).sum())
        _PREWARM_WALL = time.perf_counter() - t0
        _note(f'prewarm: first device execution fenced in '
              f'{_PREWARM_WALL:.1f}s')
    except Exception as e:
        _note(f'prewarm failed ({type(e).__name__}: {e})')


def _remaining_budget(budget, elapsed, prewarm_wall):
    """Child budget remaining, crediting the first-execution anomaly.

    The anomaly (measured 7-1040 s across sessions; device/tunnel-side,
    host CPU frozen throughout) is a per-process constant the child cannot
    influence, so it does not count against the budget: remaining =
    budget - (elapsed - anomaly).  While the prewarm fence has not landed
    yet, EVERYTHING so far is anomaly-overlapped setup, so the full budget
    remains.  Pure for the suite."""
    if prewarm_wall is None:
        return budget
    return budget - (elapsed - min(prewarm_wall, elapsed))


def _ladder_child():
    """Run the WHOLE ladder in this one process (``--child-ladder``).

    The first device execution pays the warmup anomaly exactly once (during
    the banking rung); every later rung runs at steady-state cost.  Each
    banked rung is appended to TD_BENCH_RESULTS (flushed per line) so a
    parent kill can never lose a banked number; stdout stays empty (the
    parent owns the graded line)."""
    plan = json.loads(os.environ['TD_BENCH_PLAN'])
    # First action: start the anomaly clock on a background thread so the
    # 49-527 s device-side stall overlaps everything the host does next.
    threading.Thread(target=_prewarm_device, daemon=True).start()
    global _CHILD_IDENTITY
    _CHILD_IDENTITY = identity = (
        os.environ.get('TD_BENCH_CODE_IDENTITY') or _identity())
    budget = float(os.environ.get('TD_BENCH_CHILD_BUDGET', '540'))
    results_path = os.environ['TD_BENCH_RESULTS']
    base_env = {k: os.environ.get(k) for k in _KNOB_KEYS}

    banked = set()
    attempted = 0
    for name, require_aot, has_artifact in plan:
        remaining = _remaining_budget(budget, time.time() - _PROC_T0,
                                      _PREWARM_WALL)
        reason = _child_skip_reason(name, banked, remaining, has_artifact,
                                    attempted)
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
        attempted += 1
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
    the cheapest XLA-only rung first (bank a real line), then FULL
    immediately (it either reloads its artifact in seconds or is skipped -
    never an unboundable compile), then the remaining XLA-only rung as the
    post-FULL fallback.  Putting a multi-minute cold compile BETWEEN the
    banked line and the flagship would only shrink FULL's budget (r3
    lesson); on success the runner stops grading at FULL anyway.

    FULL is NEVER the banking rung (round 5; the BENCH_r04 zero).  Marker
    walls are only comparable across rungs after subtracting each rung's
    own first-execution wall: in the r4 rehearsal BANK ran first and its
    61.2 s wall INCLUDED the 49 s warmup anomaly while FULL's later 31.6 s
    wall excluded it, so _plan scored FULL cheaper, made it the banking
    rung, and the driver host's 527 s anomaly landed inside FULL - the
    ladder died with nothing banked.  Ordering therefore uses the
    anomaly-EXCLUSIVE steady wall (wall_s - warmup1_s) and restricts the
    banking slot to the cheap rungs regardless of what any marker claims.

    The per-rung budgets are advisory (the one-process runner enforces one
    global budget); they remain the measured-wall record for ordering.
    """
    def wall(name):
        w, w1, source = _marker_wall(markers, name, identity)
        steady = None
        if w:
            # Anomaly-exclusive steady wall.  Markers without warmup1_s
            # (legacy / in-process builds) keep their full wall - they can
            # only OVERstate, never promote a rung above a measured one.
            steady = max(float(w) - float(w1 or 0.0), 10.0)
        if name in artifacts:
            # A wall measured on a COMPILE run overstates the next run by
            # the compile time once the artifact exists; only an aot-sourced
            # measurement transfers.
            if steady is not None and source == 'aot':
                return steady
            return _ARTIFACT_WALL.get(name, _ARTIFACT_WALL_DEFAULT)
        if steady is not None:
            return steady
        return _COLD_WALL[name]

    first = min(('BANK', 'XLA16'), key=wall)
    order = [first]
    if 'FULL' in artifacts:
        order.append('FULL')
    # Post-FULL fallback (reached only if FULL failed or is unavailable).
    order += [n for n in ('BANK', 'XLA16') if n != first]

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


def _expiry_action(banked_any, timing, prewarm_done, full_dead,
                   full_possible, grace_used, full_window_used):
    """What the parent does when its total budget expires.  Pure for the
    suite.  Returns (action, reason):

      'wait'        - nothing is banked: a kill GUARANTEES a zero while
                      waiting risks nothing (the external driver timeout
                      is the real bound, and rc=124-with-no-line equals
                      rc=1-with-no-line).  Round 5 measured 779-1040 s
                      first-execution anomalies - past any self-budget.
      'grace'       - a rung is mid-timing (past "warmup done", seconds
                      from banking): wait TD_BENCH_GRACE once.  BENCH_r04
                      died 3-10 s short of exactly this.
      'full_window' - a fallback is banked but the flagship can still
                      bank (artifact present, not failed): grant its
                      steady-state window once.  Four rounds have graded
                      a fallback or nothing; ~2 min buys the FULL line.
      'kill'        - print the best banked line and stop.
    """
    if not banked_any:
        why = ('the first-execution anomaly has not finished'
               if not prewarm_done else 'no rung has banked yet')
        return 'wait', f'{why}; a kill now guarantees zero lines'
    if timing is not None and not grace_used:
        return 'grace', f'{timing} is past warmup (timing in flight)'
    if full_possible and not full_dead and not full_window_used:
        return 'full_window', ('a fallback is banked and FULL can still '
                               'bank from its artifact')
    return 'kill', 'budget exhausted'


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
                          time.time() - _PROC_T0, source='inproc',
                          warmup1_s=_CHILD_WARMUP1)
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
    # went even if the run is killed externally) and parse them into a
    # tiny state machine: which rung is past "warmup done" (timing loop in
    # flight, seconds from banking - the grace-window signal), and whether
    # FULL can still bank (the early-fallback signal).
    child_state = {'timing': None, 'full_dead': False, 'prewarm_done': False}

    def _pump():
        for line in child.stderr:
            m = _TIMING_RE.search(line)
            if m:
                child_state['timing'] = m.group(1)
            m = _SETTLED_RE.search(line)
            if m and child_state['timing'] == m.group(1):
                child_state['timing'] = None
            if _FULL_DEAD_RE.search(line):
                child_state['full_dead'] = True
            if _PREWARM_RE.search(line):
                child_state['prewarm_done'] = True
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
                          e.get('source', ''), e.get('warmup1_s'))
            if key == 'FULLFAST':
                print(f'[bench] FULLFAST (ungraded ov=2 speed preset): '
                      f'{json.dumps(e["result"])}', file=sys.stderr, flush=True)
            elif key == 'FULL' and not graded_printed:
                print(json.dumps(e['result']), flush=True)
                graded_printed = True

    def _emit_fallback(reason):
        # Print the best banked non-FULL line the moment FULL can no longer
        # bank (ADVICE r4): an external kill of THIS process after that
        # point still finds a real JSON line on stdout.  graded_printed
        # then suppresses any later line - stdout carries exactly one.
        nonlocal graded_printed
        if graded_printed:
            return
        best = _graded_entry(_read_results(results_path))
        if best is not None:
            print(f'[bench] {reason}; printing the banked '
                  f'{best["config"]} fallback line now',
                  file=sys.stderr, flush=True)
            print(json.dumps(best['result']), flush=True)
            graded_printed = True

    # An external TERM/INT (the driver's `timeout`) must not lose an
    # already-banked number: print the best banked line before dying.
    # BENCH_r02 was rc=124 with an empty stdout; a graded line on stdout
    # costs nothing even when the rc is a timeout's.
    import signal

    def _on_term(signum, frame):
        _emit(_read_results(results_path))
        _emit_fallback(f'terminated externally (signal {signum})')
        try:
            child.kill()
        except Exception:
            pass
        sys.exit(0 if graded_printed else 1)

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _on_term)

    grace = float(os.environ.get('TD_BENCH_GRACE', '60'))
    full_window = float(os.environ.get('TD_BENCH_FULL_WINDOW', '150'))
    deadline = t_start + total_budget
    grace_used = False
    full_window_used = False
    last_overtime_note = 0.0
    while child.poll() is None:
        _emit(_read_results(results_path))
        now = time.monotonic()
        # Early fallback only near the deadline: firing the moment FULL
        # dies could print a cheap rung's line while a better fallback
        # (XLA16) is still about to bank; late in the run nothing better
        # is coming and the external-kill hazard dominates.
        if (not graded_printed and child_state['full_dead']
                and now > deadline - 120.0):
            _emit_fallback('FULL can no longer bank this run')
        if now > deadline:
            full_possible = ('FULL' in artifacts and 'FULL' not in reported
                             and not graded_printed)
            action, why = _expiry_action(
                banked_any=bool(reported - {'FULLFAST'}) or graded_printed,
                timing=child_state['timing'],
                prewarm_done=child_state['prewarm_done'],
                full_dead=child_state['full_dead'],
                full_possible=full_possible,
                grace_used=grace_used, full_window_used=full_window_used,
            )
            if action == 'wait':
                # Never self-kill with nothing banked; re-check each minute.
                deadline = now + 60.0
                if now - last_overtime_note > 55.0:
                    last_overtime_note = now
                    print(f'[bench] budget overtime '
                          f'(+{now - t_start - total_budget:.0f}s): {why}',
                          file=sys.stderr, flush=True)
                continue
            if action == 'grace':
                grace_used = True
                deadline = now + grace
                print(f'[bench] total budget exhausted but {why}; granting '
                      f'{grace:.0f}s grace', file=sys.stderr, flush=True)
                continue
            if action == 'full_window':
                full_window_used = True
                deadline = now + full_window
                print(f'[bench] total budget exhausted but {why}; granting '
                      f'{full_window:.0f}s for the flagship',
                      file=sys.stderr, flush=True)
                continue
            _emit(_read_results(results_path))
            _emit_fallback('budget exhausted before FULL banked')
            print(f'[bench] budget exhausted ({time.monotonic() - t_start:.0f}s'
                  f' elapsed); killing the ladder child',
                  file=sys.stderr, flush=True)
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
