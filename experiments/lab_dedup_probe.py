"""Probe: deduplicate the LAB conversions bracketing Wiener / bilateral.

The fused chain today (pipeline/image_processor.py) runs, per frame:

  _denoise_one:  compute_log_luminance(rgb)   -> rgb_to_lab(clip01(rgb))
                 modify_log_luminance(rgb, d) -> rgb_to_lab(rgb)     AGAIN
  _bilateral_one: compute_luminance(rgb')     -> rgb_to_lab(clip01(rgb'))
                 modify_luminance(rgb', out)  -> rgb_to_lab(rgb')    AGAIN

Each rgb_to_lab is a full srgb gamma decode (pow 2.4 x3) + 3x3 matmul +
cbrt x3 over a 12MP x 3ch tensor.  Two dedup rewrites, both value-exact:

  back  (bilateral/laplacian bracket): input is clipped by the preceding
        modify_*, so clip01 is a no-op and ONE rgb_to_lab(clip01(rgb))
        serves both the luminance extraction and the a/b channels.
  front (denoise bracket): input (normalize_image output) is NOT clipped,
        but srgb_to_linear(clip01(x)) == clip01(srgb_to_linear(x)) exactly
        (both branches are monotonic and fix 0/1), so the expensive gamma
        decode can be shared; only the matmul+cbrt run twice.

This probe measures both rewrites standalone at 12MP on the TPU and
verifies value-equality (including out-of-range inputs for `front`).
Stand-ins replace the Wiener/bilateral cores: the savings are additive
since the deduped ops are elementwise neighbours of those stages.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops import color as C
from tpu_darktable.utils.timing import benchmark_op

EPS = 1e-4


def old_front(rgb):
    ll = C.compute_log_luminance(rgb, eps=EPS)
    den = ll * 0.95  # stand-in for the Wiener core
    return C.modify_log_luminance(rgb, den, eps=EPS)


def new_front(rgb):
    lin = C.srgb_to_linear(rgb)
    xyz_unc = C.color_transform_3x3(lin, C._RGB_TO_XYZ)
    lab_unc = C.xyz_to_lab(xyz_unc)  # a/b for the modify (unclipped, ref exact)
    xyz_cl = C.color_transform_3x3(jnp.clip(lin, 0.0, 1.0), C._RGB_TO_XYZ)
    l_cl = C.xyz_to_lab(xyz_cl)[..., 0]
    ll = jnp.log(jnp.maximum(EPS, l_cl))
    den = ll * 0.95
    new_l = jnp.exp(den + EPS)
    lab2 = jnp.concatenate((new_l[..., None], lab_unc[..., 1:]), axis=-1)
    return jnp.clip(C.lab_to_rgb(lab2), 0.0, 1.0)


def old_back(rgb):
    lum = C.compute_luminance(rgb)
    out = lum * 0.98 + 0.005  # stand-in for the bilateral slice
    return C.modify_luminance(rgb, out)


def new_back(rgb):
    lab = C.rgb_to_lab(jnp.clip(rgb, 0.0, 1.0))  # input clipped: no-op clip
    lum = lab[..., 0]
    out = lum * 0.98 + 0.005
    lab2 = jnp.concatenate((out[..., None], lab[..., 1:]), axis=-1)
    return jnp.clip(C.lab_to_rgb(lab2), 0.0, 1.0)


def check_equality():
    rng = np.random.default_rng(0)
    # includes out-of-range values, as after normalize_image
    x = jnp.asarray(rng.uniform(-0.2, 1.3, (256, 512, 3)).astype(np.float32))
    a = np.asarray(jax.jit(old_front)(x))
    b = np.asarray(jax.jit(new_front)(x))
    d_front = np.abs(a - b).max()

    xc = jnp.clip(x, 0.0, 1.0)  # back-bracket inputs are always clipped
    a = np.asarray(jax.jit(old_back)(xc))
    b = np.asarray(jax.jit(new_back)(xc))
    d_back = np.abs(a - b).max()
    print(f'equality  front={d_front:.3e}  back={d_back:.3e}', flush=True)
    return d_front, d_back


def main():
    d_front, d_back = check_equality()
    assert d_front == 0.0 and d_back == 0.0, 'rewrites must be value-exact'

    rng = np.random.default_rng(1)
    x12 = jnp.asarray(rng.uniform(0.0, 1.0, (3000, 4096, 3)).astype(np.float32))

    variants = [
        ('old_both', lambda r: old_back(old_front(r))),
        ('new_both', lambda r: new_back(new_front(r))),
    ]
    # interleave rounds; the FIRST round in a fresh process reads high
    # (clock ramp, BASELINE.md measurement hazard) and is discarded
    results = {name: [] for name, _ in variants}
    for rnd in range(5):
        for name, fn in variants:
            t = benchmark_op(fn, x12, iters=8, warmup=1)
            results[name].append(t * 1e3)
            print(f'round {rnd} {name:10s} {t * 1e3:7.2f} ms', flush=True)
    print()
    for name, ts in results.items():
        steady = min(ts[1:])
        print(f'{name:10s} steady {steady:7.2f} ms   (all: '
              + ', '.join(f'{t:.2f}' for t in ts) + ')', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
