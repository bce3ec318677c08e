"""z-BATCHED splat/slice variants for the bilateral stage (round 3).

The shipped fast path loops over the gz (~6) z-slabs in Python, emitting
~6x the HLO ops at full-image scale; per-HLO-op overhead dominates this
backend.  These variants compute all slabs in single batched ops (z-major
leading axis), trading nothing: same FLOPs, same strided-slice structure.

Run: python experiments/bilateral_zbatch.py   (needs the chip to itself)
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
_F32 = jnp.float32


def main():
    rng = np.random.default_rng(0)
    lum = jnp.asarray(rng.random((H, W), dtype=np.float32))
    gx, gy, gz = B.compute_grid_size(W, H, SS, SR)
    s_int = int(SS)

    def splat_batched(x):
        g_z = jnp.clip(x / SR, 0.0, gz - 1)
        contrib = jnp.float32(1.0 / (SS * SS))
        z_iota = jnp.arange(gz, dtype=_F32)[:, None, None]
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z[None] - z_iota)) * contrib

        def _splat_axis_fast(img, axis, n_cells):
            img = jnp.moveaxis(img, axis, -1)
            lead = img.shape[:-1]

            def _ext(v, lo):
                k = v.shape[-1]
                parts = []
                if lo:
                    parts.append(jnp.zeros(lead + (lo,), _F32))
                parts.append(v)
                hi = n_cells - lo - k
                if hi:
                    parts.append(jnp.zeros(lead + (hi,), _F32))
                return jnp.concatenate(parts, -1) if len(parts) > 1 else v

            out = 0.0
            for m in range(s_int):
                sl = img[..., m::s_int]
                f = m / s_int
                out = out + _ext(sl * (1.0 - f), 0)
                if f > 0.0:
                    out = out + _ext(sl * f, 1)
            return jnp.moveaxis(out, -1, axis)

        sx = _splat_axis_fast(wz, 2, gx)       # (gz, H, gx)
        return _splat_axis_fast(sx, 1, gy)     # (gz, gy, gx)

    t = benchmark_op(lambda x: x + 1e-30 * jnp.sum(splat_batched(x)), lum, iters=8)
    print(f'splat z-batched: {t*1e3:.2f} ms')

    grid_b = B._blur_xyz(splat_batched(lum), 'derivative', use_pallas=None)

    frac_col = jnp.tile(jnp.arange(s_int, dtype=_F32) / s_int, W // s_int)
    frac_row = jnp.tile(jnp.arange(s_int, dtype=_F32) / s_int, H // s_int)

    def slice_batched(x):
        g = grid_b
        g_z = jnp.clip(x / SR, 0.0, gz - 1)
        ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
        frac_z = g_z - ib_z.astype(_F32)

        # all slabs upsampled at once: (gz, H, W)
        r0 = jnp.repeat(g[:, :-1, :], s_int, axis=1)
        r1 = jnp.repeat(g[:, 1:, :], s_int, axis=1)
        ry = r0 * (1.0 - frac_row)[None, :, None] + r1 * frac_row[None, :, None]
        c0 = jnp.repeat(ry[:, :, :-1], s_int, axis=2)
        c1 = jnp.repeat(ry[:, :, 1:], s_int, axis=2)
        up = c0 * (1.0 - frac_col)[None, None, :] + c1 * frac_col[None, None, :]

        z_iota = jnp.arange(gz, dtype=jnp.int32)[:, None, None]
        wz = jnp.where(ib_z[None] == z_iota, (1.0 - frac_z)[None],
                       jnp.where(ib_z[None] + 1 == z_iota, frac_z[None], 0.0))
        l_diff = jnp.sum(wz * up, axis=0)
        return jnp.maximum(0.0, x + (-DET * SR * 4.0) * l_diff)

    t = benchmark_op(slice_batched, lum, iters=8)
    print(f'slice z-batched: {t*1e3:.2f} ms')

    # tent-recompute variant: wz as the splat's tent form (identical values)
    def slice_batched_tent(x):
        g = grid_b
        g_z = jnp.clip(x / SR, 0.0, gz - 1)
        r0 = jnp.repeat(g[:, :-1, :], s_int, axis=1)
        r1 = jnp.repeat(g[:, 1:, :], s_int, axis=1)
        ry = r0 * (1.0 - frac_row)[None, :, None] + r1 * frac_row[None, :, None]
        c0 = jnp.repeat(ry[:, :, :-1], s_int, axis=2)
        c1 = jnp.repeat(ry[:, :, 1:], s_int, axis=2)
        up = c0 * (1.0 - frac_col)[None, None, :] + c1 * frac_col[None, None, :]
        z_iota = jnp.arange(gz, dtype=_F32)[:, None, None]
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z[None] - z_iota))
        l_diff = jnp.sum(wz * up, axis=0)
        return jnp.maximum(0.0, x + (-DET * SR * 4.0) * l_diff)

    t = benchmark_op(slice_batched_tent, lum, iters=8)
    print(f'slice z-batched tent: {t*1e3:.2f} ms')

    # full stage, batched splat + slice + existing fused blur
    def full_batched(x):
        grid = B._blur_xyz(splat_batched(x), 'derivative', use_pallas=None)
        g_z = jnp.clip(x / SR, 0.0, gz - 1)
        ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
        frac_z = g_z - ib_z.astype(_F32)
        r0 = jnp.repeat(grid[:, :-1, :], s_int, axis=1)
        r1 = jnp.repeat(grid[:, 1:, :], s_int, axis=1)
        ry = r0 * (1.0 - frac_row)[None, :, None] + r1 * frac_row[None, :, None]
        c0 = jnp.repeat(ry[:, :, :-1], s_int, axis=2)
        c1 = jnp.repeat(ry[:, :, 1:], s_int, axis=2)
        up = c0 * (1.0 - frac_col)[None, None, :] + c1 * frac_col[None, None, :]
        z_iota = jnp.arange(gz, dtype=jnp.int32)[:, None, None]
        wz = jnp.where(ib_z[None] == z_iota, (1.0 - frac_z)[None],
                       jnp.where(ib_z[None] + 1 == z_iota, frac_z[None], 0.0))
        l_diff = jnp.sum(wz * up, axis=0)
        return jnp.maximum(0.0, x + (-DET * SR * 4.0) * l_diff)

    t = benchmark_op(full_batched, lum, iters=8)
    print(f'full stage z-batched: {t*1e3:.2f} ms')

    # correctness vs shipped path
    ref = np.asarray(B.bilateral_process(lum, SS, SR, DET))
    out = np.asarray(full_batched(lum))
    print('max |diff| vs shipped:', np.abs(out - ref).max())


if __name__ == '__main__':
    main()
