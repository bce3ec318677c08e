"""Fused RCD interior: the full 12-step main sequence in one kernel.

The XLA formulation (ops/rcd.py) runs ~8 unfusable stencil stages - a
stencil consumer cannot fold into a stencil producer, so each stage is an
HBM round trip (~10 full planes at 12MP).  This kernel keeps a row band in
VMEM and cascades the whole chain; measured on v5e the cascade is
HBM-bound, so the extra stages ride along nearly free (see BASELINE.md
"RCD fusion analysis").

Scope: INTERIOR pixels only (>= ~12 px from every true image edge).
There the reference's region masks (rcd.cu:63-182) are all-true and every
half-grid slot read lands on a written slot, so the strict-alias stale
reads (ops/rcd.py _halfgrid_plane) never trigger - the kernel needs no
masks and no alias emulation, and its output is bit-identical to both
strict_alias modes.  The caller (ops/rcd.py rcd_demosaic) overlays the
border ladder + alias ring computed on edge strips.

Shifts use pltpu.roll (wraparound): wrap garbage enters only within
max-shift (4) of the window edge and the cumulative data reach to a kept
output row is ~12 < bh, so kept rows never see it.  All site/parity masks
are static iota parities - the row-block offset and the column pad are
even, so local parity equals global parity.

Reference semantics: csrc/debayer/rcd.cu:63-282 via ops/rcd.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS5 = 1e-5
_EPS10 = 1e-10
PAD_W = 16  # column pad (>= max column reach 12, even to keep parity)


def _kernel(x_prev, x_cur, x_next, o_ref, *, bh: int,
            r_par: tuple, b_par: tuple):
    # Halo window: the cascade's data reach is ~12 rows (+4 max shift for
    # roll wrap), so bh + 32 rows suffice.  x_prev/x_next are THIN 16-row
    # halo blocks - DMA-ing full bh-row neighbor blocks (the v1 layout)
    # tripled the input traffic of this HBM-bound kernel, and computing
    # on a full 3*bh concat would be 3x redundant compute besides.
    x = jnp.concatenate([x_prev[:], x_cur[:], x_next[:]], axis=0)
    n0, n1 = x.shape

    _shift_cache = {}

    def s(a, dy, dx):
        # Keyed on id(a): the cached entry stores `a` itself so the keyed
        # object stays alive for the whole trace (a recycled id of a GC'd
        # temporary can therefore never alias a live key).
        key = (id(a), dy, dx)
        if key in _shift_cache:
            return _shift_cache[key][1]
        y = a
        if dy:
            y = pltpu.roll(y, (-dy) % n0, 0)
        if dx:
            y = pltpu.roll(y, (-dx) % n1, 1)
        _shift_cache[key] = (a, y)
        return y

    rows = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 1)
    # bh and PAD_W are even, so local parity == global parity.
    row_odd = (rows & 1) == 1
    col_odd = (cols & 1) == 1
    par = lambda v, p: (v == 1) if p else (v == 0)
    m_r = (((rows & 1) == r_par[0]) & ((cols & 1) == r_par[1]))
    m_b = (((rows & 1) == b_par[0]) & ((cols & 1) == b_par[1]))
    m_g = ~(m_r | m_b)

    # ---- populate (rcd.cu:30-46) ----
    cfa = jnp.maximum(x, 0.0)
    rgb0 = jnp.where(m_r, cfa, 0.0)
    rgb1 = jnp.where(m_g, cfa, 0.0)
    rgb2 = jnp.where(m_b, cfa, 0.0)
    c00 = cfa
    sc = lambda dy, dx: s(cfa, dy, dx)

    # ---- step 1.1: V/H squared high pass (rcd.cu:63-75) ----
    vd = (sc(-3, 0) - 3.0 * sc(-2, 0) - sc(-1, 0) + 6.0 * c00
          - sc(1, 0) - 3.0 * sc(2, 0) + sc(3, 0)) ** 2
    hd = (sc(0, -3) - 3.0 * sc(0, -2) - sc(0, -1) + 6.0 * c00
          - sc(0, 1) - 3.0 * sc(0, 2) + sc(0, 3)) ** 2

    # ---- step 1.2: V/H local discrimination (rcd.cu:78-90) ----
    v_stat = jnp.maximum(_EPS10, s(vd, -1, 0) + vd + s(vd, 1, 0))
    h_stat = jnp.maximum(_EPS10, s(hd, 0, -1) + hd + s(hd, 0, 1))
    vh_dir = v_stat / (v_stat + h_stat)

    # ---- step 2.1: low pass (rcd.cu:93-104) ----
    lpf = (c00
           + 0.5 * (sc(-1, 0) + sc(1, 0) + sc(0, -1) + sc(0, 1))
           + 0.25 * (sc(-1, -1) + sc(-1, 1) + sc(1, -1) + sc(1, 1)))

    # ---- step 3.1: green at R/B sites (rcd.cu:107-146) ----
    vh_c = vh_dir
    vh_n = 0.25 * (s(vh_dir, -1, -1) + s(vh_dir, -1, 1)
                   + s(vh_dir, 1, -1) + s(vh_dir, 1, 1))
    vh_disc = jnp.where(jnp.abs(0.5 - vh_c) < jnp.abs(0.5 - vh_n), vh_n, vh_c)

    n_grad = _EPS5 + jnp.abs(sc(-1, 0) - sc(1, 0)) + jnp.abs(c00 - sc(-2, 0)) \
        + jnp.abs(sc(-1, 0) - sc(-3, 0)) + jnp.abs(sc(-2, 0) - sc(-4, 0))
    s_grad = _EPS5 + jnp.abs(sc(1, 0) - sc(-1, 0)) + jnp.abs(c00 - sc(2, 0)) \
        + jnp.abs(sc(1, 0) - sc(3, 0)) + jnp.abs(sc(2, 0) - sc(4, 0))
    w_grad = _EPS5 + jnp.abs(sc(0, -1) - sc(0, 1)) + jnp.abs(c00 - sc(0, -2)) \
        + jnp.abs(sc(0, -1) - sc(0, -3)) + jnp.abs(sc(0, -2) - sc(0, -4))
    e_grad = _EPS5 + jnp.abs(sc(0, 1) - sc(0, -1)) + jnp.abs(c00 - sc(0, 2)) \
        + jnp.abs(sc(0, 1) - sc(0, 3)) + jnp.abs(sc(0, 2) - sc(0, 4))

    lc = lpf
    n_est = sc(-1, 0) * (lc + lc) / (_EPS5 + lc + s(lpf, -2, 0))
    s_est = sc(1, 0) * (lc + lc) / (_EPS5 + lc + s(lpf, 2, 0))
    w_est = sc(0, -1) * (lc + lc) / (_EPS5 + lc + s(lpf, 0, -2))
    e_est = sc(0, 1) * (lc + lc) / (_EPS5 + lc + s(lpf, 0, 2))

    v_est = (s_grad * n_est + n_grad * s_est) / (n_grad + s_grad)
    h_est = (w_grad * e_est + e_grad * w_est) / (e_grad + w_grad)
    green_val = v_est + vh_disc * (h_est - v_est)
    rgb1 = jnp.where(m_g, rgb1, green_val)

    # ---- step 4.1: P/Q diagonal high pass (rcd.cu:149-163) ----
    # Interior: every half-grid slot is written, so the plane value at
    # (r, c) is the full-grid value at (r, c|1).
    pd_full = ((sc(-3, -3) - sc(-1, -1) - sc(1, 1) + sc(3, 3))
               - 3.0 * (sc(-2, -2) + sc(2, 2)) + 6.0 * c00) ** 2
    qd_full = ((sc(-3, 3) - sc(-1, 1) - sc(1, -1) + sc(3, -3))
               - 3.0 * (sc(-2, 2) + sc(2, -2)) + 6.0 * c00) ** 2
    pd = jnp.where(col_odd, pd_full, s(pd_full, 0, 1))
    qd = jnp.where(col_odd, qd_full, s(qd_full, 0, 1))

    # ---- step 4.2: P/Q local discrimination (rcd.cu:166-182) ----
    p_stat = jnp.where(
        col_odd,
        s(pd, -1, 0) + pd + s(pd, 1, 2),
        s(pd, -1, -1) + s(pd, 0, 1) + s(pd, 1, 1),
    )
    q_stat = jnp.where(
        col_odd,
        s(qd, -1, 2) + qd + s(qd, 1, 0),
        s(qd, -1, 1) + s(qd, 0, 1) + s(qd, 1, -1),
    )
    p_stat = jnp.maximum(_EPS10, p_stat)
    q_stat = jnp.maximum(_EPS10, q_stat)
    pq_raw = p_stat / (p_stat + q_stat)
    pq_dir = jnp.where(~m_g, pq_raw, 0.0)
    # Pair expansion: the slot value is pq_dir at the pair's non-green
    # column, whose parity per row follows the CFA tile.
    png_even = r_par[1] if r_par[0] == 0 else b_par[1]  # non-green col parity, even rows
    png_odd = r_par[1] if r_par[0] == 1 else b_par[1]

    def _pair_val(parity):
        if parity == 0:
            return jnp.where(col_odd, s(pq_dir, 0, -1), pq_dir)
        return jnp.where(col_odd, pq_dir, s(pq_dir, 0, 1))

    pq = jnp.where(row_odd, _pair_val(png_odd), _pair_val(png_even))

    # ---- step 5.1: R/B at opposite CFA sites (rcd.cu:185-224) ----
    pq_c = pq
    pq_n = 0.25 * (s(pq, -1, -1) + s(pq, -1, 1) + s(pq, 1, -1) + s(pq, 1, 1))
    pq_disc = jnp.where(jnp.abs(0.5 - pq_c) < jnp.abs(0.5 - pq_n), pq_n, pq_c)

    g1c = rgb1
    sg1 = lambda dy, dx: s(rgb1, dy, dx)

    def _fill_51(rgbc):
        rc = lambda dy, dx: s(rgbc, dy, dx)
        nw_grad = _EPS5 + jnp.abs(rc(-1, -1) - rc(1, 1)) \
            + jnp.abs(rc(-1, -1) - rc(-3, -3)) + jnp.abs(g1c - sg1(-2, -2))
        ne_grad = _EPS5 + jnp.abs(rc(-1, 1) - rc(1, -1)) \
            + jnp.abs(rc(-1, 1) - rc(-3, 3)) + jnp.abs(g1c - sg1(-2, 2))
        sw_grad = _EPS5 + jnp.abs(rc(-1, 1) - rc(1, -1)) \
            + jnp.abs(rc(1, -1) - rc(3, -3)) + jnp.abs(g1c - sg1(2, -2))
        se_grad = _EPS5 + jnp.abs(rc(-1, -1) - rc(1, 1)) \
            + jnp.abs(rc(1, 1) - rc(3, 3)) + jnp.abs(g1c - sg1(2, 2))
        nw_est = rc(-1, -1) - sg1(-1, -1)
        ne_est = rc(-1, 1) - sg1(-1, 1)
        sw_est = rc(1, -1) - sg1(1, -1)
        se_est = rc(1, 1) - sg1(1, 1)
        p_est = (nw_grad * se_est + se_grad * nw_est) / (nw_grad + se_grad)
        q_est = (ne_grad * sw_est + sw_grad * ne_est) / (ne_grad + sw_grad)
        return g1c + (p_est + pq_disc * (q_est - p_est))

    rgb2 = jnp.where(m_r, _fill_51(rgb2), rgb2)
    rgb0 = jnp.where(m_b, _fill_51(rgb0), rgb0)

    # ---- step 5.2: R/B at green sites (rcd.cu:227-282) ----
    ng1 = _EPS5 + jnp.abs(g1c - sg1(-2, 0))
    sg_1 = _EPS5 + jnp.abs(g1c - sg1(2, 0))
    wg1 = _EPS5 + jnp.abs(g1c - sg1(0, -2))
    eg1 = _EPS5 + jnp.abs(g1c - sg1(0, 2))

    def _fill_52(rgbc):
        rc = lambda dy, dx: s(rgbc, dy, dx)
        sn_abs = jnp.abs(rc(-1, 0) - rc(1, 0))
        ew_abs = jnp.abs(rc(0, -1) - rc(0, 1))
        n_g = ng1 + sn_abs + jnp.abs(rc(-1, 0) - rc(-3, 0))
        s_g = sg_1 + sn_abs + jnp.abs(rc(1, 0) - rc(3, 0))
        w_g = wg1 + ew_abs + jnp.abs(rc(0, -1) - rc(0, -3))
        e_g = eg1 + ew_abs + jnp.abs(rc(0, 1) - rc(0, 3))
        n_e = rc(-1, 0) - sg1(-1, 0)
        s_e = rc(1, 0) - sg1(1, 0)
        w_e = rc(0, -1) - sg1(0, -1)
        e_e = rc(0, 1) - sg1(0, 1)
        v_est = (n_g * s_e + s_g * n_e) / (n_g + s_g)
        h_est = (e_g * w_e + w_g * e_e) / (e_g + w_g)
        return g1c + (v_est + vh_disc * (h_est - v_est))

    rgb0 = jnp.where(m_g, _fill_52(rgb0), rgb0)
    rgb2 = jnp.where(m_g, _fill_52(rgb2), rgb2)

    o_ref[0] = jnp.maximum(rgb0, 0.0)[16 : 16 + bh, PAD_W : n1 - PAD_W]
    o_ref[1] = jnp.maximum(rgb1, 0.0)[16 : 16 + bh, PAD_W : n1 - PAD_W]
    o_ref[2] = jnp.maximum(rgb2, 0.0)[16 : 16 + bh, PAD_W : n1 - PAD_W]


@functools.partial(jax.jit, static_argnames=('r_par', 'b_par', 'bh', 'interpret'))
def rcd_interior(cfa, *, r_par: tuple, b_par: tuple, bh: int = 128,
                 interpret: bool = False):
    """Fused RCD main sequence on a (H, W) mosaic.

    Args:
        cfa: (H, W) float32 Bayer mosaic.
        r_par / b_par: (row_parity, col_parity) of the R / B CFA sites.
        bh: output band height (must exceed the ~12 px data reach).

    Returns:
        (3, H, W) float32 planes.  Only pixels >= ~12 px from every image
        edge are valid (the caller overlays the ring / border ladder).
    """
    h, w = cfa.shape
    if bh % 16:
        raise ValueError(f'bh must be a multiple of 16, got {bh}')
    n_rb = -(-h // bh)
    hp = (n_rb + 2) * bh
    wp = w + 2 * PAD_W
    xp = jnp.pad(cfa.astype(jnp.float32),
                 ((bh, hp - h - bh), (PAD_W, PAD_W)))

    kernel = functools.partial(_kernel, bh=bh, r_par=tuple(r_par),
                               b_par=tuple(b_par))
    # Center block plus THIN 16-row halo views (the cascade's row reach),
    # indexed in 16-row block units: prev = pixel rows [i*bh-16, i*bh),
    # next = [(i+1)*bh, (i+1)*bh+16) (+bh top pad).  16 is even, so the
    # kernel's local iota parities stay global.
    q = bh // 16
    specs = [
        pl.BlockSpec((16, wp), lambda i: ((i + 1) * q - 1, 0)),
        pl.BlockSpec((bh, wp), lambda i: (i + 1, 0)),
        pl.BlockSpec((16, wp), lambda i: ((i + 2) * q, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_rb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((3, bh, w), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, n_rb * bh, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # ~18 band-sized planes are live through the cascade; the
            # default 16M scoped-vmem cap is conservative (v5e has 128M).
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp)
    return out[:, :h]


def site_parities(pattern):
    """(r_par, b_par) row/col parities for a BayerPattern (static)."""
    from ..ops.bayer import fc_tile

    tile = fc_tile(pattern)
    (rr, rc) = np.argwhere(tile == 0)[0]
    (br, bc) = np.argwhere(tile == 2)[0]
    return (int(rr), int(rc)), (int(br), int(bc))


__all__ = ['rcd_interior', 'site_parities']
