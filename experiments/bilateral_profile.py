"""Where does the bilateral stage's time go at 12MP? (round 3, VERDICT #3)

Times the full stage and its phases (splat / blur / slice) separately on
the TPU via on-device scan chaining.  Phases are timed as standalone jitted
programs, so their sum exceeds the fused stage (XLA cross-phase fusion),
but the ratios identify the dominant phase.

Run: python experiments/bilateral_profile.py  (needs the chip to itself)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops import bilateral as B
from tpu_darktable.utils.timing import benchmark_op

H, W = 3000, 4096
SS, SR, DET = 2.0, 0.2, 0.4


def main():
    rng = np.random.default_rng(0)
    lum = jnp.asarray(rng.random((H, W), dtype=np.float32))
    gx, gy, gz = B.compute_grid_size(W, H, SS, SR)
    print(f'grid ({gz},{gy},{gx}) = {gz*gy*gx*4/2**20:.1f} MB')

    full = lambda x: B.bilateral_process(x, SS, SR, DET)
    t = benchmark_op(full, lum, iters=8)
    print(f'full stage: {t*1e3:.2f} ms')

    s_int = int(SS)

    def splat_only(x):
        g_z = jnp.clip(x / SR, 0.0, gz - 1)
        contrib = jnp.float32(1.0 / (SS * SS))

        def _splat_axis_fast(img, axis, n_cells):
            img = jnp.moveaxis(img, axis, -1)
            lead = img.shape[:-1]

            def _ext(v, lo):
                k = v.shape[-1]
                parts = []
                if lo:
                    parts.append(jnp.zeros(lead + (lo,), jnp.float32))
                parts.append(v)
                hi = n_cells - lo - k
                if hi:
                    parts.append(jnp.zeros(lead + (hi,), jnp.float32))
                return jnp.concatenate(parts, -1) if len(parts) > 1 else v

            out = 0.0
            for m in range(s_int):
                sl = img[..., m::s_int]
                f = m / s_int
                out = out + _ext(sl * (1.0 - f), 0)
                if f > 0.0:
                    out = out + _ext(sl * f, 1)
            return jnp.moveaxis(out, -1, axis)

        slabs = []
        for z in range(gz):
            wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z - z))
            sx = _splat_axis_fast(wz * contrib, 1, gx)
            slabs.append(_splat_axis_fast(sx, 0, gy))
        return jnp.stack(slabs, 0)

    # Carry the luminance plane; couple through a full reduction so the
    # whole grid is computed each iteration (cannot be DCE'd).
    t = benchmark_op(lambda x: x + 1e-30 * jnp.sum(splat_only(x)), lum, iters=8)
    print(f'splat only: {t*1e3:.2f} ms')
    grid0 = splat_only(lum)

    t = benchmark_op(
        lambda g: B._blur_xyz(g, 'derivative', use_pallas=None), grid0, iters=8)
    print(f'blur only:  {t*1e3:.2f} ms')

    grid_b = B._blur_xyz(grid0, 'derivative', use_pallas=None)

    def slice_only(lum):
        g = grid_b
        g_z = jnp.clip(lum / SR, 0.0, gz - 1)
        ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
        frac_z = g_z - ib_z.astype(jnp.float32)
        frac_col = jnp.tile(jnp.arange(s_int, dtype=jnp.float32) / s_int, W // s_int)
        frac_row = jnp.tile(jnp.arange(s_int, dtype=jnp.float32) / s_int, H // s_int)

        def xy_slice(slab):
            r0 = jnp.repeat(slab[:-1, :], s_int, axis=0)
            r1 = jnp.repeat(slab[1:, :], s_int, axis=0)
            ry = r0 * (1.0 - frac_row)[:, None] + r1 * frac_row[:, None]
            c0 = jnp.repeat(ry[:, :-1], s_int, axis=1)
            c1 = jnp.repeat(ry[:, 1:], s_int, axis=1)
            return c0 * (1.0 - frac_col)[None, :] + c1 * frac_col[None, :]

        l_diff = jnp.zeros((H, W), jnp.float32)
        for z in range(gz):
            wz = jnp.where(ib_z == z, 1.0 - frac_z,
                           jnp.where(ib_z + 1 == z, frac_z, 0.0))
            l_diff = l_diff + wz * xy_slice(g[z])
        return jnp.maximum(0.0, lum + (-DET * SR * 4.0) * l_diff)

    t = benchmark_op(slice_only, lum, iters=8)
    print(f'slice only: {t*1e3:.2f} ms')


if __name__ == '__main__':
    main()
