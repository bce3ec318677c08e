#!/usr/bin/env python
"""Benchmark: full fused ISP pipeline, 12MP RAW -> sRGB frames/sec on one chip.

Measures the flagship path (decode12 -> WB -> RCD -> postprocess -> Wiener ->
bilateral -> metrics -> adaptive tonemap -> uint8) as ONE jitted XLA program,
the BASELINE.json north-star configuration.  Prints one JSON line (stdout
carries nothing else; progress goes to stderr).

Driver-proofing (round 3; BENCH_r02 was rc=124 because the persistent compile
cache did not survive to the bench host, so every ladder rung hit a fresh
multi-minute compile).  The measurement runs in budgeted child processes and
the ladder adapts to the cache state recorded in a warm-marker file:

  warm (marker matches current code): FULL config first (batch 16, Pallas RCD
      interior; cached reload ~20 s), BANK as fallback.
  cold: BANK first (batch 2, XLA-only; fresh compile ~70 s) to guarantee a
      real JSON line, then XLA16 (batch 16, XLA-only) to upgrade it.  The
      FULL config is never attempted cold - the RCD interior's Mosaic
      compile alone can take 5-25 min on this host and cannot fit any
      ladder budget.  BILAT16 (batch 16, bilateral band Pallas on) is a
      resume-only rung: its cold compile measured 485 s (the standalone
      ~70 s Mosaic number does not hold inside the full program), so it
      only runs when a prior warm run on the same host banked its marker.

A total wall budget (TD_BENCH_TOTAL_BUDGET, default 540 s) trims upgrade
rungs once a line is banked, so the worst case stays inside any plausible
driver timeout (~120 s warm).  A real fps line always beats a timeout.

Env knobs: TD_BENCH_BATCH (default 16), TD_BENCH_ITERS (default 5),
TD_BENCH_W/TD_BENCH_H (default 4096x3000), TD_BENCH_COMPILE_BUDGET (seconds,
default 240; set 0 to run in-process with no budget/fallback - this is also
how the round-end cache warm is done).

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

_MARKER_PATH = os.path.expanduser('~/.cache/tpu_darktable/bench_warm.json')


def _identity():
    """Hash of everything that keys the persistent compile cache for this
    bench: package source, jax version, and the bench shape env knobs."""
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


def _read_markers():
    try:
        with open(_MARKER_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _write_marker(config_name: str, identity: str):
    try:
        os.makedirs(os.path.dirname(_MARKER_PATH), exist_ok=True)
        markers = _read_markers()
        markers[config_name] = identity
        with open(_MARKER_PATH, 'w') as f:
            json.dump(markers, f)
    except Exception as e:  # marker is an optimization, never fatal
        print(f'[bench] marker write failed: {e}', file=sys.stderr)


def _config_name_from_env():
    """Which ladder config the current env selects (FULL unless the
    Pallas kernels are disabled by a fallback rung's overrides)."""
    if os.environ.get('TD_RCD_PALLAS', '1') == '0':
        if os.environ.get('TD_BENCH_BATCH') == '2':
            return 'BANK'
        if os.environ.get('TD_BILATERAL_PALLAS', '1') == '0':
            return 'XLA16'
        return 'BILAT16'
    return 'FULL'


def _bench_child():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    iters = int(os.environ.get('TD_BENCH_ITERS', '5'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))

    def note(msg):
        print(f'[bench] {time.strftime("%H:%M:%S")} {msg}', file=sys.stderr, flush=True)

    note(f'building pipeline (batch={batch}, {width}x{height})')
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
    fn = jax.jit(
        build_pipeline_fn(
            settings, (width, height), td.BayerPattern.RGGB, td.PackedFormat.Packed12, True
        )
    )

    n_bytes = height * width * 3 // 2
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], dtype=jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    note('compiling / warmup (cached reload is ~20s; fresh compile is minutes)')
    out, b, m = fn(data, wb, bounds, metrics, alpha)
    np.asarray(m)  # fence
    note('warmup done, timing')

    t0 = time.perf_counter()
    for _ in range(iters):
        out, b, m = fn(data, wb, bounds, metrics, alpha)
        np.asarray(m)  # fence: same executable, tiny transfer
    dt = (time.perf_counter() - t0) / (iters * batch)

    fps = 1.0 / dt
    mp = width * height / 1e6
    config = _config_name_from_env()
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
    return 0


# Ladder configs: name -> env overrides.  FULL is the graded flagship
# configuration (all Pallas kernels on); BILAT16 drops only the RCD
# interior kernel (whose fresh Mosaic compile is unboundable, 5-25 min)
# but keeps the bilateral band kernel (~70 s Mosaic compile, affordable
# cold); XLA16 drops both; BANK additionally drops to batch 2 for the
# fastest possible cold compile.
_CONFIGS = {
    'FULL': {},
    'BILAT16': {'TD_RCD_PALLAS': '0'},
    'XLA16': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0'},
    'BANK': {'TD_RCD_PALLAS': '0', 'TD_BILATERAL_PALLAS': '0',
             'TD_BENCH_BATCH': '2'},
}


def _plan(markers, identity, full_budget):
    """Ladder for the current cache state: start from the best config the
    warm markers vouch for; cold hosts bank cheap rungs first and upgrade.
    BILAT16 is never attempted cold (485 s measured fresh compile)."""
    if markers.get('FULL') == identity:
        return [('FULL', full_budget), ('BANK', 150.0)]
    if markers.get('BILAT16') == identity:
        return [('BILAT16', 200.0), ('BANK', 150.0)]
    if markers.get('XLA16') == identity:
        return [('XLA16', 200.0), ('BANK', 150.0)]
    return [('BANK', 150.0), ('XLA16', 200.0)]


def main():
    budget = float(os.environ.get('TD_BENCH_COMPILE_BUDGET', '240'))
    if '--child' in sys.argv or budget <= 0:
        rc = _bench_child()
        if rc == 0 and budget <= 0:
            # In-process run (round-end warm): record the cache as warm for
            # the config selected by the current env.
            _write_marker(_config_name_from_env(), _identity())
        return rc

    identity = _identity()
    markers = _read_markers()
    plan = _plan(markers, identity, budget)
    if plan[0][0] == 'BANK':
        print('[bench] compile cache looks cold for this code state; '
              'banking a cheap config first', file=sys.stderr, flush=True)

    total_budget = float(os.environ.get('TD_BENCH_TOTAL_BUDGET', '540'))
    t_start = time.monotonic()
    best = None  # (value, line)
    for i, (name, timeout_s) in enumerate(plan, 1):
        elapsed = time.monotonic() - t_start
        if best is not None and elapsed + timeout_s > total_budget:
            print(f'[bench] skipping {name}: {elapsed:.0f}s elapsed + '
                  f'{timeout_s:.0f}s budget exceeds total {total_budget:.0f}s',
                  file=sys.stderr, flush=True)
            continue
        overrides = _CONFIGS[name]
        env = dict(os.environ)
        env.update(overrides)
        print(f'[bench] attempt {i}/{len(plan)} {name} {overrides or "(default)"} '
              f'budget {timeout_s:.0f}s', file=sys.stderr, flush=True)
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--child'],
                env=env, timeout=timeout_s, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired as e:
            print(f'[bench] attempt {i} ({name}) exceeded {timeout_s:.0f}s budget, '
                  'killed', file=sys.stderr, flush=True)
            if e.stderr:
                err = e.stderr if isinstance(e.stderr, str) else e.stderr.decode(
                    'utf-8', 'replace')
                sys.stderr.write(err)
            continue
        sys.stderr.write(res.stderr)
        line = next(
            (ln for ln in reversed(res.stdout.splitlines())
             if ln.startswith('{') and '"value"' in ln),
            None,
        )
        if res.returncode == 0 and line:
            _write_marker(name, identity)
            value = json.loads(line).get('value', 0.0)
            if best is None or value > best[0]:
                best = (value, line)
            if name == 'FULL':
                break  # flagship config measured; nothing better to try
        else:
            print(f'[bench] attempt {i} ({name}) failed rc={res.returncode}',
                  file=sys.stderr, flush=True)

    if best is not None:
        print(best[1])
        return 0
    print('[bench] all attempts failed', file=sys.stderr, flush=True)
    return 1


if __name__ == '__main__':
    sys.exit(main())
