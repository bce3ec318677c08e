"""Golden-snapshot regression: freeze the verified fused-pipeline semantics.

Goldens were generated on the CPU backend after the oracle-parity suite
passed (round 1; pattern/IDS/aspect cases added round 2); any future change
that alters outputs beyond uint8 round-off will trip these.  Regenerate ONLY
after re-validating against tests/test_oracle_parity.py:
  python tests/test_goldens.py --regen            # all cases
  python tests/test_goldens.py --regen-missing    # only new cases
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

import tpu_darktable as td
from tpu_darktable.ops import packed
from tpu_darktable.pipeline import ImageProcessor
from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper

GOLDEN = Path(__file__).parent / 'goldens' / 'pipeline_goldens.npz'

_BASE = dict(size=(96, 64), pattern=td.BayerPattern.RGGB,
             fmt=td.PackedFormat.Packed12)

CASES = {
    'rcd_reinhard': dict(_BASE, settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
        postprocess=True, enable_denoise=True, enable_bilateral=True)),
    'ppg_aces': dict(_BASE, settings=dict(
        debayer=Debayer.ppg, tone_mapping=ToneMapper.aces,
        postprocess=True, enable_denoise=False, enable_bilateral=False)),
    'bilinear_adaptive_aces': dict(_BASE, settings=dict(
        debayer=Debayer.bilinear, tone_mapping=ToneMapper.adaptive_aces,
        postprocess=False, enable_denoise=True, enable_bilateral=False)),
    'rcd_linear_lap': dict(_BASE, settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.linear,
        postprocess=False, enable_denoise=False,
        enable_bilateral=False, enable_laplacian=True, lap_clarity=0.3)),
    # Round-2 coverage: IDS byte layout, every non-RGGB pattern, and a
    # realistic 4:3 geometry where the RCD border ladder / strip assembly
    # (ops/rcd.py strip=16) meets real margins (VERDICT r1 weak #5).
    'rcd_reinhard_ids': dict(_BASE, fmt=td.PackedFormat.Packed12_IDS,
                             settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
        postprocess=True, enable_denoise=True, enable_bilateral=True)),
    'rcd_bggr': dict(_BASE, pattern=td.BayerPattern.BGGR, settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
        postprocess=True, enable_denoise=False, enable_bilateral=False)),
    'rcd_grbg': dict(_BASE, pattern=td.BayerPattern.GRBG, settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
        postprocess=True, enable_denoise=False, enable_bilateral=False)),
    'ppg_gbrg': dict(_BASE, pattern=td.BayerPattern.GBRG, settings=dict(
        debayer=Debayer.ppg, tone_mapping=ToneMapper.aces,
        postprocess=True, enable_denoise=False, enable_bilateral=False)),
    'rcd_4to3_aspect': dict(size=(320, 240), pattern=td.BayerPattern.RGGB,
                            fmt=td.PackedFormat.Packed12, settings=dict(
        debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
        postprocess=True, enable_denoise=True, enable_bilateral=True)),
}


def _input_bytes(size, fmt):
    w, h = size
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mosaic = np.clip(0.4 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
                     + rng.normal(0, 0.04, (h, w)).astype(np.float32), 0, 1)
    ids = fmt is td.PackedFormat.Packed12_IDS
    return np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1)),
                                            ids_format=ids))


def _run_case(case):
    settings = ImageProcessingSettings(
        tone_intensity=2.0, tone_gamma=1.2, light_adapt=0.8, vibrance=0.3,
        **case['settings']
    )
    proc = ImageProcessor(case['size'], case['pattern'], case['fmt'],
                          settings, white_balance=(1.2, 1.0, 1.1))
    data = _input_bytes(case['size'], case['fmt'])
    return np.asarray(proc.process(jnp.asarray(data), 'x'))


def test_pipeline_goldens():
    goldens = np.load(GOLDEN)
    for name, case in CASES.items():
        out = _run_case(case)
        ref = goldens[name]
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (name, diff.max(), (diff > 1).sum())


if __name__ == '__main__' and ('--regen' in sys.argv or '--regen-missing' in sys.argv):
    existing = dict(np.load(GOLDEN)) if (GOLDEN.exists() and '--regen-missing' in sys.argv) else {}
    for n, case in CASES.items():
        if n not in existing:
            existing[n] = _run_case(case)
            print('generated', n)
    np.savez_compressed(GOLDEN, **existing)
    print(f'wrote {GOLDEN}')
