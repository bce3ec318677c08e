"""Adaptive-ACES tail: vibrance restructure candidates (VERDICT r4 #7).

The builder profile (BASELINE.md round 3) shows the adaptive-ACES tail at
~9.4 ms/frame (12MP) vs a 5.6 ms traffic floor, with vibrance's LAB round
trip ~1.9 ms.  The reference semantics pin every transcendental (srgb
decode pow2.4, LAB cbrt, f_inv cubes, srgb encode pow(1/2.4)), but the
L/a/b affine arithmetic between them is removable: LAB is affine in the
_lab_f outputs, so the vibrance scales can be applied directly in f-space,
and the D65 white-point normalization folds into the 3x3 matrices.

Variants (all end in uint8, matching _finish):
  cur    - modify_vibrance as shipped (stack LAB, scale, lab_to_rgb, clip01)
  fspace - f-space vibrance + white-folded matrices + clip01 dropped before
           the uint8 clamp (round(clip01(x)*255) == clip(round(x*255)))
  novib  - gamma + uint8 only (lower bound: what vibrance costs on top)

Also times the FULL tail (adaptation + aces curve + finish) with cur vs
fspace.  Prints max |diff| of each variant against cur (budget 1e-7 on the
float path, <=1 count on uint8).

Protocol: benchmark_op on-device scan chaining; interleaved repeats with
the first measurement of each variant discarded (BASELINE.md measurement
hazard).  Run alone on the TPU.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import color, tonemap
from tpu_darktable.utils.timing import benchmark_op

H, W = 3000, 4096

_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)
_M_FWD = color._RGB_TO_XYZ / _WHITE[:, None]      # rgb_lin -> xyz/white
_M_INV = color._XYZ_TO_RGB * _WHITE[None, :]      # f_inv -> rgb_lin


def _finish_cur(tonemapped, gamma, vibrance):
    g = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / gamma)
    return tonemap._to_uint8(color.modify_vibrance(g, vibrance))


def _vibrance_fspace(rgb, amount):
    lin = color.srgb_to_linear(rgb)
    n = color.color_transform_3x3(lin, _M_FWD)
    fx = color._lab_f(n[..., 0])
    fy = color._lab_f(n[..., 1])
    fz = color._lab_f(n[..., 2])
    # normalized a = 500(fx-fy)/128, b = 200(fy-fz)/128
    a = (500.0 / 128.0) * (fx - fy)
    b = (200.0 / 128.0) * (fy - fz)
    chroma = jnp.sqrt(a * a + b * b)
    ls = 1.0 - amount * chroma * 0.25
    ss = 1.0 + amount * chroma
    # L' = L*ls with L = (116fy-16)/100  =>  fy' = ls*fy + (16/116)(1-ls)
    fy2 = ls * fy + (16.0 / 116.0) * (1.0 - ls)
    fx2 = ss * (fx - fy) + fy2
    fz2 = fy2 - ss * (fy - fz)
    f_inv = jnp.stack((color._lab_f_inv(fx2), color._lab_f_inv(fy2),
                       color._lab_f_inv(fz2)), axis=-1)
    return color.linear_to_srgb(color.color_transform_3x3(f_inv, _M_INV))


def _finish_fspace(tonemapped, gamma, vibrance):
    g = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / gamma)
    return tonemap._to_uint8(_vibrance_fspace(g, vibrance))


def _finish_novib(tonemapped, gamma, vibrance):
    g = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / gamma)
    return tonemap._to_uint8(jnp.clip(g, 0.0, 1.0))


def _tail(finish):
    params = tonemap.TonemapParameters(1.5, 2.0, 0.8, 0.5)
    metrics = jnp.asarray([-2.3, 0.18, 0.2, 0.18, 0.16], jnp.float32)

    def run(rgb):
        adj = tonemap._compute_adaptation(metrics, rgb, params.light_adapt,
                                          params.intensity)
        tm = tonemap._aces_curve(rgb / adj)
        # return float32 so the scan carry keeps a stable dtype
        return finish(tm, params.gamma, params.vibrance).astype(jnp.float32) / 255.0

    return run


def main():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((H, W, 3), np.float32) * 0.9 + 0.05)

    # numeric check (vibrance step alone, float path)
    g = jnp.power(jnp.maximum(rgb * 0.8, 0.0), 1.0 / 1.5)
    ref = np.asarray(color.modify_vibrance(g, 0.5))
    new = np.clip(np.asarray(_vibrance_fspace(g, 0.5)), 0.0, 1.0)
    print(f'float max|diff| fspace vs cur: {np.abs(ref - new).max():.3g}')
    u_ref = np.asarray(tonemap._to_uint8(color.modify_vibrance(g, 0.5)))
    u_new = np.asarray(tonemap._to_uint8(_vibrance_fspace(g, 0.5)))
    print(f'uint8 max count diff: {np.abs(u_ref.astype(int) - u_new.astype(int)).max()}')

    variants = {
        'cur': _tail(_finish_cur),
        'fspace': _tail(_finish_fspace),
        'novib': _tail(_finish_novib),
    }
    reps = {k: [] for k in variants}
    for rep in range(4):
        for name, fn in variants.items():
            dt = benchmark_op(fn, rgb, iters=8, warmup=2)
            reps[name].append(dt * 1e3)
            print(f'rep{rep} {name:7s} {dt * 1e3:7.2f} ms', flush=True)
    print()
    for name, xs in reps.items():
        xs = xs[1:]  # discard first (clock-ramp bias)
        print(f'{name:7s} median {np.median(xs):7.2f} ms  (reps {xs})')


if __name__ == '__main__':
    main()
