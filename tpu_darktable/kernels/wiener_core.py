"""Fused Wiener tile core: window+mean fold, rDFT, spectral gain, inverse.

One Pallas grid step per tile-row: a (n_tx, K^2) batch of flattened tiles
loads into VMEM, the folded analysis matmul (MXU) produces spectra + tile
means, the spectral gain applies, and the folded synthesis matmul
reconstructs - one HBM read and one HBM write for the whole
DFT -> gain -> IDFT -> window chain, whose XLA formulation round-trips
several slab-sized intermediates through HBM (~65 ms of a 170 ms 12MP/3ch
stage is non-matmul; see ops/wiener.py).

Tiles arrive pre-flattened: Mosaic cannot shape-cast lane dimensions, so
the spatial->tile-major permute happens XLA-side where it fuses into the
slab-construction / overlap-add copy fusions (ops/wiener.py) - the same
permute XLA's einsum canonicalization inserts internally on the fallback
path, so it is not added cost.

Mosaic only lowers DEFAULT/HIGHEST dot precisions, so fp32-grade accuracy
is built manually as bf16x3: operands split into exact bf16 hi + bf16 lo
residual, x@A ~= xh@Ah + xh@Al + xl@Ah with f32 accumulation - the same
algorithm XLA uses for Precision.HIGH on TPU.  Basis matrices arrive as
f32 and are split once outside the kernel (bf16 halves the resident VMEM).

Bases are the same folded matrices as the XLA path (ops/wiener.py
`_rdft2_basis` + window/mean folding); reference semantics:
csrc/denoise/denoise.cu:181-220.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-15
_BF16 = jnp.bfloat16


def _dot3(x, m_hi, m_lo):
    """bf16x3 emulated-f32 matmul: x (f32) @ (m_hi + m_lo)."""
    xh = x.astype(_BF16)
    xl = (x - xh.astype(jnp.float32)).astype(_BF16)
    acc = jnp.dot(xh, m_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(xh, m_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xl, m_hi, preferred_element_type=jnp.float32)
    return acc


def _kernel(sig2_ref, tiles_ref, ana_h, ana_l, syn_h, syn_l, a0_ref, mc_ref,
            o_ref, *, n_rep: int):
    """One (n_tx, K^2) tile batch through the rDFT round trip."""
    xt = tiles_ref[0]  # (n_tx, K^2)

    raw = _dot3(xt, ana_h[:], ana_l[:])  # (n_tx, 2R+1)
    mean = raw[:, -1:]
    spec = raw[:, :-1] - mean * a0_ref[:]
    a_part = spec[:, :n_rep]
    b_part = spec[:, n_rep:]
    power = a_part * a_part + b_part * b_part + _EPS
    gain = jnp.maximum(power - sig2_ref[pl.program_id(0)], 0.0) / power
    spec = jnp.concatenate([a_part * gain, b_part * gain], axis=1)

    y = _dot3(spec, syn_h[:], syn_l[:])  # (n_tx, K^2)
    o_ref[0] = y + mean * mc_ref[:]


@functools.partial(jax.jit, static_argnames=('n_rep', 'interpret'))
def wiener_tile_core(tiles, ana_t, syn_t, a0, mc, sig2, *, n_rep: int,
                     interpret: bool = False):
    """Apply the folded Wiener tile transform to flattened tile batches.

    Args:
        tiles: (B, n_tx, K^2) float32 flattened tiles, one batch row per
            (slab, tile-row); channel and coset fold into B.
        ana_t: (K^2, 2R+1) float32 folded analysis (window-scaled, mean
            row last).
        syn_t: (2R, K^2) float32 folded synthesis (window-scaled).
        a0: (1, 2R) mean response of the analysis rows.
        mc: (1, K^2) mean reconstruction map (wf2*wi2 flattened).
        sig2: (B,) per-batch-row noise variance.

    Returns:
        (B, n_tx, K^2) float32 reconstructed (window-weighted) tiles.
    """
    b, n_tx, kk = tiles.shape
    kernel = functools.partial(_kernel, n_rep=n_rep)
    const = lambda *_: (0, 0)  # noqa: E731 - bases resident across the grid

    ana_h = ana_t.astype(_BF16)
    ana_l = (ana_t - ana_h.astype(jnp.float32)).astype(_BF16)
    syn_h = syn_t.astype(_BF16)
    syn_l = (syn_t - syn_h.astype(jnp.float32)).astype(_BF16)

    mat_specs = [pl.BlockSpec(m.shape, const) for m in (ana_h, ana_l, syn_h, syn_l)]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sig2 (B,)
            pl.BlockSpec((1, n_tx, kk), lambda i: (i, 0, 0)),
            *mat_specs,
            pl.BlockSpec(a0.shape, const),
            pl.BlockSpec(mc.shape, const),
        ],
        out_specs=pl.BlockSpec((1, n_tx, kk), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(tiles.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(jnp.asarray(sig2, dtype=jnp.float32).reshape(b), tiles,
      ana_h, ana_l, syn_h, syn_l, a0, mc)


__all__ = ['wiener_tile_core']
