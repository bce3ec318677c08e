"""Fused bilateral-grid detail boost: splat -> blur xyz -> slice in one pass.

The XLA formulation (ops/bilateral.py fast path) runs the z-slab splat,
three blur passes and the per-slab slice as separate HBM round trips.
This kernel keeps a row band's grid (all gz slabs) in VMEM and does the
whole chain with one read of the luminance and one write of the output.

Decomposition: with integer sigma_s = s dividing the image, every pixel
(r, c) = (rp*s + mr, cp*s + mc) splats to grid cells (rp + {0,1},
cp + {0,1}) with PHASE-CONSTANT weights (1-mr/s, mr/s) x (1-mc/s, mc/s),
and the slice reads back the same cells with the same weights.  The
image is therefore passed as s^2 phase planes (s, s, H/s, W/s) built
XLA-side (strided slicing is free there; Mosaic cannot lane-split), and
every kernel op is an elementwise map, a +-1/ +-2 pltpu.roll, or a mask.

Zero-truncation semantics of the blurs (bilateral.cu:132-204) are kept
by re-zeroing the out-of-grid pad lanes/rows after each shifted sum.

Reference semantics: bilateral.cu:56-228 via ops/bilateral.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 8  # lane pad each side of the grid (>= blur taps + splat shift)

_W_GAUSS = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
_W_DERIV = (-2.0 / 16.0, -4.0 / 16.0, 0.0, 4.0 / 16.0, 2.0 / 16.0)


def _kernel(ph_prev, ph_cur, ph_next, o_ref, *, s: int, bg: int, gz: int,
            gy: int, gx: int, wg: int, sigma_r: float, contrib: float,
            z_mode: str):
    """One band of bg grid rows -> s*bg output image rows (phase planes).

    ph_*: (s, s, bg, wg) phase-plane blocks; wg = W/s.  The concat gives
    3*bg phase rows; grid rows [bg, 2*bg) are produced exactly, using
    +-halo grid rows computed from the neighbouring blocks.
    """
    i = pl.program_id(0)
    ph = jnp.concatenate([ph_prev[:], ph_cur[:], ph_next[:]], axis=2)
    n_rows = 3 * bg  # phase rows in-window
    row0 = i * bg - bg  # true grid-row index of window row 0

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wg + 2 * _PAD), 0) + row0
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wg + 2 * _PAD), 1) - _PAD
    in_grid = (rows_g >= 0) & (rows_g < gy) & (cols_g >= 0) & (cols_g < gx)
    # Pad phase rows hold zero luminance, whose z-tent weight is NONZERO at
    # z=0 - mask them out of the splat (phase rows valid in [0, gy-1)).
    ph_rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, wg), 0) + row0
    ph_valid = (ph_rows >= 0) & (ph_rows < gy - 1)

    def padw(x):
        z = jnp.zeros((n_rows, _PAD), dtype=jnp.float32)
        return jnp.concatenate([z, x, z], axis=1)

    def shift(x, dy, dx):
        y = x
        if dy:
            y = pltpu.roll(y, (-dy) % n_rows, 0)
        if dx:
            y = pltpu.roll(y, (-dx) % (wg + 2 * _PAD), 1)
        return y

    # ---- splat all gz slabs (tent in z, phase-constant weights in xy) ----
    # Grid cell (gr, gc) collects (1-fr)(1-fc) from phase pixel (gr, gc),
    # fr from phase row gr-1, fc from phase col gc-1 (tent: pixel p feeds
    # cells floor(p/s) and floor(p/s)+1) -> negative shifts.
    slabs = []
    for z in range(gz):
        acc = jnp.zeros((n_rows, wg + 2 * _PAD), dtype=jnp.float32)
        for mr in range(s):
            fr = mr / s
            for mc in range(s):
                fc = mc / s
                lum = ph[mr, mc]  # (n_rows, wg): pixel (rp*s+mr, cp*s+mc)
                g_z = jnp.clip(lum / sigma_r, 0.0, gz - 1.0)
                wz = jnp.maximum(0.0, 1.0 - jnp.abs(g_z - z)) * contrib
                wzp = padw(jnp.where(ph_valid, wz, 0.0))
                acc = acc + (1.0 - fr) * (1.0 - fc) * wzp
                if fc > 0.0:
                    acc = acc + (1.0 - fr) * fc * shift(wzp, 0, -1)
                if fr > 0.0:
                    acc = acc + fr * (1.0 - fc) * shift(wzp, -1, 0)
                    if fc > 0.0:
                        acc = acc + fr * fc * shift(wzp, -1, -1)
        slabs.append(jnp.where(in_grid, acc, 0.0))

    # ---- blur x (5-tap), y (5-tap), z (derivative|gaussian) ----
    def blur_axis(sl, dy, dx, weights):
        out = weights[2] * sl
        for t, wt in ((0, weights[0]), (1, weights[1]), (3, weights[3]), (4, weights[4])):
            if wt == 0.0:
                continue
            d = t - 2
            out = out + wt * shift(sl, dy * d, dx * d)
        return jnp.where(in_grid, out, 0.0)

    slabs = [blur_axis(sl, 0, 1, _W_GAUSS) for sl in slabs]
    slabs = [blur_axis(sl, 1, 0, _W_GAUSS) for sl in slabs]
    wz_taps = _W_DERIV if z_mode == 'derivative' else _W_GAUSS
    zed = []
    for z in range(gz):
        acc = jnp.zeros_like(slabs[0])
        for t, wt in enumerate(wz_taps):
            zz = z + t - 2
            if wt == 0.0 or zz < 0 or zz >= gz:
                continue
            acc = acc + wt * slabs[zz]
        zed.append(acc)

    # ---- slice back to phase planes ----
    for mr in range(s):
        fr = mr / s
        for mc in range(s):
            fc = mc / s
            lum = ph[mr, mc]
            g_z = jnp.clip(lum / sigma_r, 0.0, gz - 1.0)
            ib_z = jnp.minimum(g_z.astype(jnp.int32), gz - 2)
            frac_z = g_z - ib_z.astype(jnp.float32)
            val = jnp.zeros_like(lum)
            for z in range(gz):
                wz = jnp.where(ib_z == z, 1.0 - frac_z,
                               jnp.where(ib_z + 1 == z, frac_z, 0.0))
                g = zed[z]
                v = ((1.0 - fr) * (1.0 - fc) * g
                     + (1.0 - fr) * fc * shift(g, 0, 1)
                     + fr * (1.0 - fc) * shift(g, 1, 0)
                     + fr * fc * shift(g, 1, 1))
                val = val + wz * v[:, _PAD : _PAD + wg]
            o_ref[mr, mc] = val[bg : 2 * bg]


@functools.partial(jax.jit, static_argnames=(
    's', 'gz', 'sigma_r', 'z_mode', 'bg', 'interpret'))
def bilateral_fused(lum, *, s: int, gz: int, sigma_r: float,
                    z_mode: str = 'derivative', bg: int = 32,
                    interpret: bool = False):
    """Fused splat/blur/slice of the bilateral grid (fast integer-sigma path).

    Args:
        lum: (H, W) float32 luminance, H % s == 0, W % s == 0.
        s: integer sigma_s (grid is (H/s+1, W/s+1, gz)).
        gz: z cells; sigma_r: z scale; z_mode: 'derivative' | 'gaussian'.

    Returns:
        (H, W) float32 sliced grid response (the l_diff plane).
    """
    h, w = lum.shape
    gy, gx = h // s + 1, w // s + 1
    wg = w // s
    n_gr = h // s  # phase rows (grid rows minus the +1 edge cell)
    n_b = -(-n_gr // bg)
    hp = (n_b + 2) * bg

    # (s, s, H/s, W/s) phase planes, padded with a bg block top/bottom.
    phases = lum.astype(jnp.float32).reshape(h // s, s, w // s, s)
    phases = jnp.moveaxis(jnp.moveaxis(phases, 1, 0), 3, 1)  # (s, s, H/s, W/s)
    phases = jnp.pad(phases, ((0, 0), (0, 0), (bg, hp - n_gr - bg), (0, 0)))

    contrib = 1.0 / (s * s)
    kernel = functools.partial(
        _kernel, s=s, bg=bg, gz=gz, gy=gy, gx=gx, wg=wg,
        sigma_r=float(sigma_r), contrib=float(contrib), z_mode=z_mode)
    view = lambda sft: pl.BlockSpec(
        (s, s, bg, wg), lambda i, sft=sft: (0, 0, i + sft, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[view(0), view(1), view(2)],
        out_specs=pl.BlockSpec((s, s, bg, wg), lambda i: (0, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((s, s, n_b * bg, wg), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(phases, phases, phases)
    out = out[:, :, :n_gr]  # (s, s, H/s, W/s)
    # riffle phases back to (H, W)
    out = jnp.moveaxis(jnp.moveaxis(out, 1, 3), 0, 1)  # (H/s, s, W/s, s)
    return out.reshape(h, w)


__all__ = ['bilateral_fused']
