"""Golden-snapshot regression: freeze the verified fused-pipeline semantics.

Goldens were generated on the CPU backend after the oracle-parity suite
passed (round 1); any future change that alters outputs beyond uint8
round-off will trip these.  Regenerate ONLY after re-validating against
tests/test_oracle_parity.py:  python tests/test_goldens.py --regen
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

CASES = {
    'rcd_reinhard': dict(debayer=Debayer.rcd, tone_mapping=ToneMapper.reinhard,
                         postprocess=True, enable_denoise=True, enable_bilateral=True),
    'ppg_aces': dict(debayer=Debayer.ppg, tone_mapping=ToneMapper.aces,
                     postprocess=True, enable_denoise=False, enable_bilateral=False),
    'bilinear_adaptive_aces': dict(debayer=Debayer.bilinear,
                                   tone_mapping=ToneMapper.adaptive_aces,
                                   postprocess=False, enable_denoise=True,
                                   enable_bilateral=False),
    'rcd_linear_lap': dict(debayer=Debayer.rcd, tone_mapping=ToneMapper.linear,
                           postprocess=False, enable_denoise=False,
                           enable_bilateral=False, enable_laplacian=True,
                           lap_clarity=0.3),
}


def _run_case(kw, data):
    settings = ImageProcessingSettings(
        tone_intensity=2.0, tone_gamma=1.2, light_adapt=0.8, vibrance=0.3, **kw
    )
    proc = ImageProcessor((96, 64), td.BayerPattern.RGGB, td.PackedFormat.Packed12,
                          settings, white_balance=(1.2, 1.0, 1.1))
    return np.asarray(proc.process(jnp.asarray(data), 'x'))


def _input_bytes():
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    mosaic = np.clip(0.4 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
                     + rng.normal(0, 0.04, (64, 96)).astype(np.float32), 0, 1)
    return np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1))))


def test_pipeline_goldens():
    data = _input_bytes()
    goldens = np.load(GOLDEN)
    for name, kw in CASES.items():
        out = _run_case(kw, data)
        ref = goldens[name]
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (name, diff.max(), (diff > 1).sum())


if __name__ == '__main__' and '--regen' in sys.argv:
    data = _input_bytes()
    np.savez_compressed(GOLDEN, **{n: _run_case(kw, data) for n, kw in CASES.items()})
    print(f'wrote {GOLDEN}')
