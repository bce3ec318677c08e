"""RCD (Ratio Corrected Demosaic) - the reference's flagship demosaic.

TPU-native rebuild of csrc/debayer/rcd.cu (darktable's RCD).  The reference
launches a 12-kernel sequence over 9 persistent full-size buffers with
half-grid (idx/2) addressing for the low-pass and diagonal-discrimination
planes.  Here the whole algorithm is one pure function on full-resolution
arrays:

- every half-grid plane is represented full-grid; the reference's integer
  `idx/2` slot arithmetic (including the places where reads land on slots the
  half-grid pass never wrote, aliasing onto the v/h high-pass data that
  shares the buffer - rcd.cu:637-656 reuses VP_diff_/HQ_diff_ for
  p_diff/q_diff) is reproduced exactly so float32 output matches the CUDA
  implementation everywhere, not just in the interior;
- pixel-class dispatch (R/G/B sites, even/odd columns) becomes masked
  selects over statically shifted slices, which XLA fuses into one pass.

Assumes even width/height (every shipped camera geometry is even; the
half-grid emulation relies on it).
"""

from __future__ import annotations

import jax.numpy as jnp

from .._validate import as_mosaic
from .bayer import BayerPattern
from .demosaic import border_interpolate, ppg_green, ppg_redblue
from ._stencil import Shifter, interior_mask, row_col_iota, site_masks

_F32 = jnp.float32
_EPS5 = 1e-5
_EPS10 = 1e-10
RCD_MARGIN = 7


def _region(h, w, r0, r1, c0, c1):
    rows, cols = row_col_iota(h, w)
    return (rows >= r0) & (rows <= r1) & (cols >= c0) & (cols <= c1)


def _halfgrid_plane(values_full, background_full, h, w, r0, r1, c0, c1,
                    strict_alias=True, stale=None):
    """Emulate the reference's half-grid buffer with stale-alias background.

    The CUDA code writes `plane[idx/2]` at odd columns of rows [r0, r1]
    (rcd.cu:149-163) into a buffer that still holds `background` (the v/h
    high-pass) everywhere else; reads at slot s return the written value when
    {2s, 2s+1} contains a written site, else the stale background at flat
    index s.  Returns a full-grid array F with F[r, c] = buffer[(r*w + c)//2]
    for odd c (the only columns ever read through this path).

    `stale`: optional precomputed (h, w//2) stale plane.  Used by the edge
    strips of the Pallas-interior path, whose stale values must come from
    the FULL image's flat indexing (a strip-local flat reshape diverges).
    """
    slots = values_full[..., :, 1::2]  # value at (r, 2j+1) -> slot r*w/2 + j
    written = _region(h, w // 2, r0, r1, (c0 - 1) // 2, (c1 - 1) // 2)
    if stale is not None:
        plane = jnp.where(written, slots, stale)
    elif strict_alias:
        flat = background_full.reshape(background_full.shape[:-2] + (h * w,))
        stale = flat[..., : h * (w // 2)].reshape(background_full.shape[:-2] + (h, w // 2))
        plane = jnp.where(written, slots, stale)
    else:
        plane = jnp.where(written, slots, 0.0)
    return jnp.repeat(plane, 2, axis=-1)


def rcd_demosaic(image, pattern: BayerPattern, strict_alias: bool = True,
                 use_pallas: bool | None = None):
    """Full RCD: border ladder + 12-step main sequence (RCDImpl::process,
    rcd.cu:601-671).

    Args:
        image: (H, W) or (H, W, 1) Bayer mosaic, float32, even dimensions.
        pattern: CFA pattern.
        strict_alias: replicate the reference's half-grid buffer-alias stale
            reads bit-for-bit (affects only rows/cols within ~8 px of the
            RCD_MARGIN boundary).  False uses zeros as the background -
            cleaner semantics, required for tile/shard decompositions whose
            block-local aliasing would otherwise differ from the full image.
        use_pallas: run the interior through the fused Pallas cascade
            (kernels/rcd_interior.py) with the alias ring + border ladder on
            XLA edge strips.  None = auto (TPU backend, image large enough).
            Interior values agree with the XLA path to float-reassociation
            (~2e-7; Mosaic lowers divides as reciprocal-multiplies).

    Returns:
        (H, W, 3) RGB.
    """
    x = as_mosaic(image, 'image', dtype=_F32)
    h, w = x.shape
    if h % 2 or w % 2:
        raise ValueError(f'RCD requires even dimensions, got {h}x{w}')

    if use_pallas is None:
        # Auto: TPU backend + large frames, where the fused cascade wins
        # (11.8 vs 18 ms at 12MP).  Small frames keep the XLA path - the
        # kernel's Mosaic compile runs minutes per fresh shape on remote-
        # compile hosts (cached reloads are fast; __init__ enables a
        # persistent cache).  Override with TD_RCD_PALLAS=1/0.
        import os

        import jax

        env = os.environ.get('TD_RCD_PALLAS')
        if env in ('0', '1'):
            use_pallas = env == '1'
        else:
            use_pallas = (
                jax.default_backend() == 'tpu' and h * w >= 4_000_000
            )
    if use_pallas and h >= 96 and w >= 96:
        return _rcd_pallas(x, pattern, strict_alias)
    return _rcd_xla(x, pattern, strict_alias)


_RING = 12   # px of output taken from the XLA edge strips
_STRIP = 32  # strip height/width (>= _RING + inner-edge contamination ~16)


def _vh_highpass(x):
    """Global V/H squared high-pass planes (rcd.cu:63-75) - the stale-alias
    background source for the half-grid buffers."""
    h, w = x.shape
    s = Shifter(jnp.maximum(x, 0.0), 4, mode='constant')
    c00 = s(0, 0)
    vd = (s(-3, 0) - 3.0 * s(-2, 0) - s(-1, 0) + 6.0 * c00
          - s(1, 0) - 3.0 * s(2, 0) + s(3, 0)) ** 2
    hd = (s(0, -3) - 3.0 * s(0, -2) - s(0, -1) + 6.0 * c00
          - s(0, 1) - 3.0 * s(0, 2) + s(0, 3)) ** 2
    r34 = _region(h, w, 3, h - 4, 3, w - 4)
    return jnp.where(r34, vd, 0.0), jnp.where(r34, hd, 0.0)


def _rcd_pallas(x, pattern: BayerPattern, strict_alias: bool):
    """Fused-interior RCD: Pallas cascade for pixels >= _RING from every
    edge, XLA strips (with injected global stale planes when strict_alias)
    for the ring + border ladder."""
    from ..kernels.rcd_interior import rcd_interior, site_parities

    import jax

    h, w = x.shape
    rp, bp = site_parities(pattern)
    interp = jax.default_backend() != 'tpu'  # CPU tests run interpreted
    interior = jnp.moveaxis(
        rcd_interior(x, r_par=rp, b_par=bp, interpret=interp), 0, -1)

    if strict_alias:
        vd, hd = _vh_highpass(x)
        stale_v = vd.reshape(h * w)[: h * (w // 2)].reshape(h, w // 2)
        stale_h = hd.reshape(h * w)[: h * (w // 2)].reshape(h, w // 2)
        # Stale plane for global column c lives at slot (r, c//2); slice per
        # strip.  The top strip's local flat indexing equals the global one.
        sv_b, sh_b = stale_v[h - _STRIP:], stale_h[h - _STRIP:]
        sv_l, sh_l = stale_v[:, : _STRIP // 2], stale_h[:, : _STRIP // 2]
        sv_r, sh_r = stale_v[:, (w - _STRIP) // 2:], stale_h[:, (w - _STRIP) // 2:]
        top = _rcd_xla(x[:_STRIP], pattern, True)
        bottom = _rcd_xla(x[h - _STRIP:], pattern, True, sv_b, sh_b)
        left = _rcd_xla(x[:, :_STRIP], pattern, True, sv_l, sh_l)
        right = _rcd_xla(x[:, w - _STRIP:], pattern, True, sv_r, sh_r)
    else:
        top = _rcd_xla(x[:_STRIP], pattern, False)
        bottom = _rcd_xla(x[h - _STRIP:], pattern, False)
        left = _rcd_xla(x[:, :_STRIP], pattern, False)
        right = _rcd_xla(x[:, w - _STRIP:], pattern, False)

    r = _RING
    mid = jnp.concatenate(
        [left[r : h - r, :r], interior[r : h - r, r : w - r],
         right[r : h - r, -r:]], axis=1)
    return jnp.concatenate([top[:r], mid, bottom[-r:]], axis=0)


def _rcd_xla(x, pattern: BayerPattern, strict_alias: bool,
             stale_v=None, stale_h=None):
    """The pure-XLA RCD sequence (optionally with injected stale planes)."""
    h, w = x.shape
    masks = site_masks(h, w, pattern)
    m_g = masks['g']
    rows, cols = row_col_iota(h, w)
    col_odd = (cols & 1) == 1

    # ---- populate (rcd.cu:30-46) ----
    cfa = jnp.maximum(x, 0.0)
    rgb0 = jnp.where(masks['r'], cfa, 0.0)
    rgb1 = jnp.where(m_g, cfa, 0.0)
    rgb2 = jnp.where(masks['b'], cfa, 0.0)

    s = Shifter(cfa, 4, mode='constant')
    c00 = s(0, 0)

    # ---- step 1.1: V/H squared high pass (rcd.cu:63-75) ----
    vd = (s(-3, 0) - 3.0 * s(-2, 0) - s(-1, 0) + 6.0 * c00 - s(1, 0) - 3.0 * s(2, 0) + s(3, 0)) ** 2
    hd = (s(0, -3) - 3.0 * s(0, -2) - s(0, -1) + 6.0 * c00 - s(0, 1) - 3.0 * s(0, 2) + s(0, 3)) ** 2
    r34 = _region(h, w, 3, h - 4, 3, w - 4)
    vd = jnp.where(r34, vd, 0.0)
    hd = jnp.where(r34, hd, 0.0)

    # ---- step 1.2: V/H local discrimination (rcd.cu:78-90) ----
    sv = Shifter(vd, 1, mode='constant')
    sh = Shifter(hd, 1, mode='constant')
    v_stat = jnp.maximum(_EPS10, sv(-1, 0) + sv(0, 0) + sv(1, 0))
    h_stat = jnp.maximum(_EPS10, sh(0, -1) + sh(0, 0) + sh(0, 1))
    vh_dir = jnp.where(_region(h, w, 2, h - 3, 2, w - 3), v_stat / (v_stat + h_stat), 0.0)

    # ---- step 2.1: low pass at non-green sites (rcd.cu:93-104) ----
    # Computed full-grid; every read lands on a written slot (same-parity
    # sites at (r, c), (r+-2, c), (r, c+-2)), so the plain formula suffices.
    lpf = (
        c00
        + 0.5 * (s(-1, 0) + s(1, 0) + s(0, -1) + s(0, 1))
        + 0.25 * (s(-1, -1) + s(-1, 1) + s(1, -1) + s(1, 1))
    )

    # ---- step 3.1: green at R/B sites (rcd.cu:107-146) ----
    svh = Shifter(vh_dir, 1, mode='constant')
    vh_c = svh(0, 0)
    vh_n = 0.25 * (svh(-1, -1) + svh(-1, 1) + svh(1, -1) + svh(1, 1))
    vh_disc = jnp.where(jnp.abs(0.5 - vh_c) < jnp.abs(0.5 - vh_n), vh_n, vh_c)

    n_grad = _EPS5 + jnp.abs(s(-1, 0) - s(1, 0)) + jnp.abs(c00 - s(-2, 0)) + jnp.abs(s(-1, 0) - s(-3, 0)) + jnp.abs(s(-2, 0) - s(-4, 0))
    s_grad = _EPS5 + jnp.abs(s(1, 0) - s(-1, 0)) + jnp.abs(c00 - s(2, 0)) + jnp.abs(s(1, 0) - s(3, 0)) + jnp.abs(s(2, 0) - s(4, 0))
    w_grad = _EPS5 + jnp.abs(s(0, -1) - s(0, 1)) + jnp.abs(c00 - s(0, -2)) + jnp.abs(s(0, -1) - s(0, -3)) + jnp.abs(s(0, -2) - s(0, -4))
    e_grad = _EPS5 + jnp.abs(s(0, 1) - s(0, -1)) + jnp.abs(c00 - s(0, 2)) + jnp.abs(s(0, 1) - s(0, 3)) + jnp.abs(s(0, 2) - s(0, 4))

    sl = Shifter(lpf, 2, mode='constant')
    lc = sl(0, 0)
    n_est = s(-1, 0) * (lc + lc) / (_EPS5 + lc + sl(-2, 0))
    s_est = s(1, 0) * (lc + lc) / (_EPS5 + lc + sl(2, 0))
    w_est = s(0, -1) * (lc + lc) / (_EPS5 + lc + sl(0, -2))
    e_est = s(0, 1) * (lc + lc) / (_EPS5 + lc + sl(0, 2))

    v_est = (s_grad * n_est + n_grad * s_est) / (n_grad + s_grad)
    h_est = (w_grad * e_est + e_grad * w_est) / (e_grad + w_grad)
    green_val = v_est + vh_disc * (h_est - v_est)  # mix(V, H, disc)

    site31 = (~m_g) & _region(h, w, 4, h - 5, 4, w - 5)
    rgb1 = jnp.where(site31, green_val, rgb1)

    # ---- step 4.1: P/Q diagonal high pass at odd columns (rcd.cu:149-163) ----
    pd_full = ((s(-3, -3) - s(-1, -1) - s(1, 1) + s(3, 3)) - 3.0 * (s(-2, -2) + s(2, 2)) + 6.0 * c00) ** 2
    qd_full = ((s(-3, 3) - s(-1, 1) - s(1, -1) + s(3, -3)) - 3.0 * (s(-2, 2) + s(2, -2)) + 6.0 * c00) ** 2
    # Half-grid planes share the v/h diff buffers (rcd.cu:650-652); reads at
    # unwritten slots alias onto vd/hd data.  _halfgrid_plane reproduces that.
    pd = _halfgrid_plane(pd_full, vd, h, w, 3, h - 4, 3, w - 4, strict_alias,
                         stale=stale_v)
    qd = _halfgrid_plane(qd_full, hd, h, w, 3, h - 4, 3, w - 4, strict_alias,
                         stale=stale_h)

    # ---- step 4.2: P/Q local discrimination (rcd.cu:166-182) ----
    # Slot arithmetic resolves to column-parity-dependent gathers:
    #   P: (r-1, odd(c-1)), (r, odd(c)), (r+1, odd(c-1)+2)
    #   Q: (r-1, odd(c-1)+2), (r, odd(c)), (r+1, odd(c-1))
    # with odd(v) = v | 1.  pd/qd are column-pair-constant, so reading at the
    # resolved odd column equals reading pd at that column directly.
    sp = Shifter(pd, 3, mode='constant')
    sq = Shifter(qd, 3, mode='constant')
    p_stat = jnp.where(
        col_odd,
        sp(-1, 0) + sp(0, 0) + sp(1, 2),
        sp(-1, -1) + sp(0, 1) + sp(1, 1),
    )
    q_stat = jnp.where(
        col_odd,
        sq(-1, 2) + sq(0, 0) + sq(1, 0),
        sq(-1, 1) + sq(0, 1) + sq(1, -1),
    )
    p_stat = jnp.maximum(_EPS10, p_stat)
    q_stat = jnp.maximum(_EPS10, q_stat)
    pq_raw = p_stat / (p_stat + q_stat)
    pq_dir = jnp.where(_region(h, w, 2, h - 3, 2, w - 3) & ~m_g, pq_raw, 0.0)
    # Non-green sites fill every half-grid slot in rows [2, h-3]; expand to a
    # full-grid plane where both columns of a slot carry the slot's value.
    pq_pairs = jnp.where((~m_g)[:, 0::2], pq_dir[:, 0::2], pq_dir[:, 1::2])
    pq = jnp.repeat(pq_pairs, 2, axis=-1)

    # ---- step 5.1: R/B at opposite CFA sites (rcd.cu:185-224) ----
    spq = Shifter(pq, 1, mode='constant')
    pq_c = spq(0, 0)
    pq_n = 0.25 * (spq(-1, -1) + spq(-1, 1) + spq(1, -1) + spq(1, 1))
    pq_disc = jnp.where(jnp.abs(0.5 - pq_c) < jnp.abs(0.5 - pq_n), pq_n, pq_c)

    sg1 = Shifter(rgb1, 3, mode='constant')
    g1c = sg1(0, 0)
    r51 = _region(h, w, 4, h - 4, 4, w - 4)

    def _fill_51(rgbc):
        rc = Shifter(rgbc, 3, mode='constant')
        nw_grad = _EPS5 + jnp.abs(rc(-1, -1) - rc(1, 1)) + jnp.abs(rc(-1, -1) - rc(-3, -3)) + jnp.abs(g1c - sg1(-2, -2))
        ne_grad = _EPS5 + jnp.abs(rc(-1, 1) - rc(1, -1)) + jnp.abs(rc(-1, 1) - rc(-3, 3)) + jnp.abs(g1c - sg1(-2, 2))
        sw_grad = _EPS5 + jnp.abs(rc(-1, 1) - rc(1, -1)) + jnp.abs(rc(1, -1) - rc(3, -3)) + jnp.abs(g1c - sg1(2, -2))
        se_grad = _EPS5 + jnp.abs(rc(-1, -1) - rc(1, 1)) + jnp.abs(rc(1, 1) - rc(3, 3)) + jnp.abs(g1c - sg1(2, 2))
        nw_est = rc(-1, -1) - sg1(-1, -1)
        ne_est = rc(-1, 1) - sg1(-1, 1)
        sw_est = rc(1, -1) - sg1(1, -1)
        se_est = rc(1, 1) - sg1(1, 1)
        p_est = (nw_grad * se_est + se_grad * nw_est) / (nw_grad + se_grad)
        q_est = (ne_grad * sw_est + sw_grad * ne_est) / (ne_grad + sw_grad)
        return g1c + (p_est + pq_disc * (q_est - p_est))

    # At an R site fill blue (color = 2 - fc = 2), at a B site fill red.
    rgb2 = jnp.where(masks['r'] & r51, _fill_51(rgb2), rgb2)
    rgb0 = jnp.where(masks['b'] & r51, _fill_51(rgb0), rgb0)

    # ---- step 5.2: R/B at green sites (rcd.cu:227-282) ----
    n1 = _EPS5 + jnp.abs(g1c - sg1(-2, 0))
    s1 = _EPS5 + jnp.abs(g1c - sg1(2, 0))
    w1 = _EPS5 + jnp.abs(g1c - sg1(0, -2))
    e1 = _EPS5 + jnp.abs(g1c - sg1(0, 2))

    def _fill_52(rgbc):
        rc = Shifter(rgbc, 3, mode='constant')
        sn_abs = jnp.abs(rc(-1, 0) - rc(1, 0))
        ew_abs = jnp.abs(rc(0, -1) - rc(0, 1))
        n_g = n1 + sn_abs + jnp.abs(rc(-1, 0) - rc(-3, 0))
        s_g = s1 + sn_abs + jnp.abs(rc(1, 0) - rc(3, 0))
        w_g = w1 + ew_abs + jnp.abs(rc(0, -1) - rc(0, -3))
        e_g = e1 + ew_abs + jnp.abs(rc(0, 1) - rc(0, 3))
        n_e = rc(-1, 0) - sg1(-1, 0)
        s_e = rc(1, 0) - sg1(1, 0)
        w_e = rc(0, -1) - sg1(0, -1)
        e_e = rc(0, 1) - sg1(0, 1)
        v_est = (n_g * s_e + s_g * n_e) / (n_g + s_g)
        h_est = (e_g * w_e + w_g * e_e) / (e_g + w_g)
        return g1c + (v_est + vh_disc * (h_est - v_est))

    g52 = m_g & r51
    rgb0 = jnp.where(g52, _fill_52(rgb0), rgb0)
    rgb2 = jnp.where(g52, _fill_52(rgb2), rgb2)

    # ---- write output inside RCD_MARGIN + border ladder ring ----
    # Only a RCD_MARGIN-wide ring of the border ladder (rcd.cu:616-631)
    # survives write_output (rcd.cu:666-668), and its data dependencies reach
    # at most ~11 px inward - so the ladder runs on narrow edge strips
    # instead of 3 full-image passes (which cost more than the entire main
    # RCD sequence on TPU).  Assembly is concatenation, not masked selects.
    rgb = jnp.maximum(jnp.stack((rgb0, rgb1, rgb2), axis=-1), 0.0)
    m = RCD_MARGIN
    strip = 16  # ring(7) + redblue(1) + green(3) + interp context
    if h <= 2 * strip + 2 or w <= 2 * strip + 2:
        out = _border_ladder(x, pattern)
        keep = interior_mask(h, w, m)
        return jnp.where(keep[..., None], rgb, out)

    top = _border_ladder(x[:strip], pattern)[:m]
    bottom = _border_ladder(x[-strip:], pattern)[-m:]
    left = _border_ladder(x[:, :strip], pattern)[m : h - m, :m]
    right = _border_ladder(x[:, -strip:], pattern)[m : h - m, -m:]
    mid = jnp.concatenate([left, rgb[m : h - m, m : w - m], right], axis=1)
    return jnp.concatenate([top, mid, bottom], axis=0)


def _border_ladder(x, pattern: BayerPattern):
    """The reference's three-pass border fill (border_interpolate 3 ->
    rcd_border_green 32 -> rcd_border_redblue 16, rcd.cu:616-631) on the
    given (sub-)image.  Only values within RCD_MARGIN of a TRUE image edge
    are meaningful to callers."""
    h, w = x.shape
    out = border_interpolate(x, pattern, 3)
    green_b = ppg_green(x, pattern, clamp_input=True)
    green_ring = interior_mask(h, w, 3) & ~interior_mask(h, w, 32)
    out = jnp.where(green_ring[..., None], green_b, out)
    rb_b = ppg_redblue(out, pattern, clamp_input=True)
    rb_ring = ~interior_mask(h, w, 16)
    return jnp.where(rb_ring[..., None], rb_b, out)


# ---------------------------------------------------------------------------
# Dual-demosaic blend utilities (rcd.cu:20-27, :496-561; present but unwired
# in the reference).  dual_demosaic() additionally composes them into the
# darktable dual-demosaic flow: blend a high-frequency demosaic (RCD) with a
# smooth one (bilinear) by a detail mask.
# ---------------------------------------------------------------------------

def calc_blend_factor(value, threshold):
    """Sigmoid blend factor, inflexion at (threshold, 0.5) (rcd.cu:20-27)."""
    return 1.0 / (1.0 + jnp.exp(16.0 - (16.0 / threshold) * value))


def calc_y0_mask(rgb, red: float, green: float, blue: float):
    """Luminance-proxy mask sqrt(mean(channel/coeff)) (rcd.cu:517-530)."""
    rgb = jnp.asarray(rgb, dtype=_F32)
    val = (
        jnp.maximum(rgb[..., 0] / red, 0.0)
        + jnp.maximum(rgb[..., 1] / green, 0.0)
        + jnp.maximum(rgb[..., 2] / blue, 0.0)
    )
    return jnp.sqrt(val / 3.0)


def calc_scharr_mask(mask):
    """Scharr gradient magnitude / 16, clipped (rcd.cu:532-548).

    Edge pixels read from the row/col clamped one inside (incol/inrow)."""
    import numpy as np

    x = jnp.asarray(mask, dtype=_F32)
    h, w = x.shape
    s = Shifter(x, 1, mode='constant')
    gx = (47.0 / 255.0) * (s(-1, -1) - s(-1, 1) + s(1, -1) - s(1, 1)) + (162.0 / 255.0) * (
        s(0, -1) - s(0, 1)
    )
    gy = (47.0 / 255.0) * (s(-1, -1) - s(1, -1) + s(-1, 1) - s(1, 1)) + (162.0 / 255.0) * (
        s(-1, 0) - s(1, 0)
    )
    grad = jnp.clip(jnp.hypot(gx, gy) / 16.0, 0.0, 1.0)
    # edge pixels evaluate the stencil at the clamped interior position
    ry = jnp.asarray(np.clip(np.arange(h), 1, h - 2))
    cx = jnp.asarray(np.clip(np.arange(w), 1, w - 2))
    return grad[ry][:, cx]


def calc_detail_blend(mask, threshold: float, detail: bool):
    """Blend map from a detail mask (rcd.cu:550-561)."""
    blend = jnp.clip(calc_blend_factor(jnp.asarray(mask, dtype=_F32), threshold), 0.0, 1.0)
    return blend if detail else 1.0 - blend


def blend_dual(high, low, blend_mask, show_mask: bool = False):
    """lerp(low, high, blend) per pixel (write_blended_dual_kernel,
    rcd.cu:496-515)."""
    high = jnp.asarray(high, dtype=_F32)
    low = jnp.asarray(low, dtype=_F32)
    b = jnp.asarray(blend_mask, dtype=_F32)[..., None]
    out = jnp.maximum((1.0 - b) * low + b * high, 0.0)
    if show_mask:
        return jnp.concatenate([out, jnp.asarray(blend_mask)[..., None]], axis=-1)
    return out


def dual_demosaic(image, pattern: BayerPattern, threshold: float = 0.15,
                  wb=(1.0, 1.0, 1.0)):
    """Dual demosaic: RCD where detailed, bilinear where smooth."""
    from .demosaic import bilinear5x5_demosaic

    high = rcd_demosaic(image, pattern)
    low = bilinear5x5_demosaic(image, pattern)
    y0 = calc_y0_mask(high, *wb)
    scharr = calc_scharr_mask(y0)
    blend = calc_detail_blend(scharr, threshold, detail=True)
    return blend_dual(high, low, blend)


__all__ = [
    'RCD_MARGIN',
    'blend_dual',
    'calc_blend_factor',
    'calc_detail_blend',
    'calc_scharr_mask',
    'calc_y0_mask',
    'dual_demosaic',
    'rcd_demosaic',
]
