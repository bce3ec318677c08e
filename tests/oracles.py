"""Slow numpy transliterations of the reference CUDA kernels.

These follow the CUDA sources (csrc/debayer/*.cu) pixel-by-pixel with the
same indexing, guards and buffer semantics, serving as independent oracles
for the vectorized jnp implementations: the jnp versions use masked selects,
shifted slices and half-grid emulation, exactly where vectorization bugs
would hide.  Small images only.
"""

from __future__ import annotations

import numpy as np

from tpu_darktable.ops.bayer import BayerPattern, fc


# --- bilinear5x5 (bilinear.cu) --------------------------------------------

_OFFSETS = [
    (-2, 0),
    (-1, -1), (-1, 0), (-1, 1),
    (0, -2), (0, -1), (0, 0), (0, 1), (0, 2),
    (1, -1), (1, 0), (1, 1),
    (2, 0),
]  # (dx, dy) int2 pairs

_ORDERS = {
    BayerPattern.RGGB: (0, 1, 2, 3),
    BayerPattern.BGGR: (3, 1, 2, 0),
    BayerPattern.GRBG: (1, 0, 3, 2),
    BayerPattern.GBRG: (1, 3, 0, 2),
}


def bilinear5x5_oracle(x, pattern, kernels):
    h, w = x.shape
    out = np.zeros((h, w, 3), dtype=np.float64)
    order = _ORDERS[pattern]
    for y in range(h):
        for xx in range(w):
            c_idx = 2 * (y & 1) + (xx & 1)
            ptype = order[c_idx]
            acc = np.zeros(3)
            s = np.zeros(3)
            for k, (dx, dy) in enumerate(_OFFSETS):
                cy = min(max(y + dy, 0), h - 1)
                cx = min(max(xx + dx, 0), w - 1)
                wgt = kernels[ptype][k]
                acc += wgt * x[cy, cx]
                s += wgt
            out[y, xx] = acc / s
    return out


# --- border_interpolate (ppg.cu:342-389) -----------------------------------

def border_interpolate_oracle(x, pattern, border):
    h, w = x.shape
    out = np.zeros((h, w, 3), dtype=np.float64)
    for y in range(h):
        for c in range(w):
            if border <= c < w - border and border <= y < h - border:
                continue
            s = np.zeros(4)
            cnt = np.zeros(4, dtype=int)
            for j in range(y - 1, y + 2):
                for i in range(c - 1, c + 2):
                    if 0 <= j < h and 0 <= i < w:
                        f = fc(j, i, pattern)
                        s[f] += max(0.0, x[j, i])
                        cnt[f] += 1
            i_val = max(0.0, x[y, c])
            o = np.empty(3)
            o[0] = s[0] / cnt[0] if cnt[0] > 0 else i_val
            o[1] = (s[1] + s[3]) / (cnt[1] + cnt[3]) if cnt[1] + cnt[3] > 0 else i_val
            o[2] = s[2] / cnt[2] if cnt[2] > 0 else i_val
            f = fc(y, c, pattern)
            if f == 0:
                o[0] = i_val
            elif f == 2:
                o[2] = i_val
            else:
                o[1] = i_val
            out[y, c] = o
    return out


# --- ppg green (ppg.cu:120-224) --------------------------------------------

def _buf(x, y, c, clamp_input=False):
    h, w = x.shape
    if 0 <= y < h and 0 <= c < w:
        v = x[y, c]
        return max(0.0, v) if clamp_input else v
    return 0.0


def ppg_green_oracle(x, pattern, clamp_input=False):
    """Returns the full (H, W, 3) green-pass image for writable pixels
    ([3, size-4]); others zero."""
    h, w = x.shape
    out = np.zeros((h, w, 3), dtype=np.float64)

    def b(y, c):
        return _buf(x, y, c, clamp_input)

    for y in range(3, h - 3):
        for c in range(3, w - 3):
            code = fc(y, c, pattern)
            pc = b(y, c)
            color = np.zeros(3)
            if code == 0:
                color[0] = pc
            elif code == 1:
                color[1] = pc
            elif code == 2:
                color[2] = pc
            else:
                color[1] = pc
            if code in (0, 2):
                pym, pym2, pym3 = b(y - 1, c), b(y - 2, c), b(y - 3, c)
                pyM, pyM2, pyM3 = b(y + 1, c), b(y + 2, c), b(y + 3, c)
                pxm, pxm2, pxm3 = b(y, c - 1), b(y, c - 2), b(y, c - 3)
                pxM, pxM2, pxM3 = b(y, c + 1), b(y, c + 2), b(y, c + 3)
                guessx = (pxm + pc + pxM) * 2.0 - pxM2 - pxm2
                diffx = (abs(pxm2 - pc) + abs(pxM2 - pc) + abs(pxm - pxM)) * 3.0 + (
                    abs(pxM3 - pxM) + abs(pxm3 - pxm)
                ) * 2.0
                guessy = (pym + pc + pyM) * 2.0 - pyM2 - pym2
                diffy = (abs(pym2 - pc) + abs(pyM2 - pc) + abs(pym - pyM)) * 3.0 + (
                    abs(pyM3 - pyM) + abs(pym3 - pym)
                ) * 2.0
                if diffx > diffy:
                    m, M = min(pym, pyM), max(pym, pyM)
                    color[1] = max(min(guessy * 0.25, M), m)
                else:
                    m, M = min(pxm, pxM), max(pxm, pxM)
                    color[1] = max(min(guessx * 0.25, M), m)
            out[y, c] = np.maximum(color, 0.0)
    return out


# --- ppg red/blue (ppg.cu:230-337) ------------------------------------------

def ppg_redblue_oracle(rgb, pattern, clamp_input=False):
    h, w = rgb.shape[:2]
    out = np.zeros((h, w, 3), dtype=np.float64)

    def b(y, c):
        if 0 <= y < h and 0 <= c < w:
            v = rgb[y, c]
            return np.maximum(v, 0.0) if clamp_input else v
        return np.zeros(3)

    for y in range(h):
        for c in range(w):
            code = fc(y, c, pattern)
            color = b(y, c).copy()
            if y == 0 or c == 0 or c == w - 1 or y == h - 1:
                out[y, c] = np.maximum(color, 0.0)
                continue
            if code in (1, 3):
                nt, nb, nl, nr = b(y - 1, c), b(y + 1, c), b(y, c - 1), b(y, c + 1)
                if fc(y, c + 1, pattern) == 0:
                    color[2] = (nt[2] + nb[2] + 2.0 * color[1] - nt[1] - nb[1]) * 0.5
                    color[0] = (nl[0] + nr[0] + 2.0 * color[1] - nl[1] - nr[1]) * 0.5
                else:
                    color[0] = (nt[0] + nb[0] + 2.0 * color[1] - nt[1] - nb[1]) * 0.5
                    color[2] = (nl[2] + nr[2] + 2.0 * color[1] - nl[1] - nr[1]) * 0.5
            else:
                ntl, ntr = b(y - 1, c - 1), b(y - 1, c + 1)
                nbl, nbr = b(y + 1, c - 1), b(y + 1, c + 1)
                ch = 2 if code == 0 else 0
                diff1 = abs(ntl[ch] - nbr[ch]) + abs(ntl[1] - color[1]) + abs(nbr[1] - color[1])
                guess1 = ntl[ch] + nbr[ch] + 2.0 * color[1] - ntl[1] - nbr[1]
                diff2 = abs(ntr[ch] - nbl[ch]) + abs(ntr[1] - color[1]) + abs(nbl[1] - color[1])
                guess2 = ntr[ch] + nbl[ch] + 2.0 * color[1] - ntr[1] - nbl[1]
                if diff1 > diff2:
                    color[ch] = guess2 * 0.5
                elif diff1 < diff2:
                    color[ch] = guess1 * 0.5
                else:
                    color[ch] = (guess1 + guess2) * 0.25
            out[y, c] = np.maximum(color, 0.0)
    return out


def ppg_oracle(x, pattern, median_threshold=0.0):
    """Full PPG pipeline (PPGImpl::process, ppg.cu:413-464)."""
    from tpu_darktable.ops import demosaic as dm
    import jax.numpy as jnp

    h, w = x.shape
    temp = border_interpolate_oracle(x, pattern, 3)
    src = x
    if median_threshold > 0.0:
        src = np.asarray(dm.pre_median(jnp.asarray(x), pattern, median_threshold / 100.0))
    green = ppg_green_oracle(src, pattern)
    for y in range(3, h - 3):
        for c in range(3, w - 3):
            temp[y, c] = green[y, c]
    return ppg_redblue_oracle(temp, pattern)


# --- RCD (rcd.cu) -----------------------------------------------------------

def rcd_oracle(x, pattern):
    """Literal transliteration of RCDImpl::process (rcd.cu:601-671) with FLAT
    workspace buffers so the half-grid idx/2 addressing and the buffer
    aliasing (VP_diff_/HQ_diff_ reused for p_diff/q_diff) behave exactly as
    in CUDA."""
    h, w = x.shape
    eps, epssq = 1e-5, 1e-10

    # border ladder
    out = border_interpolate_oracle(x, pattern, 3)
    g = ppg_green_oracle(x, pattern, clamp_input=True)
    for y in range(3, h - 3):
        for c in range(3, w - 3):
            if not (32 <= c < w - 32 and 32 <= y < h - 32):
                out[y, c] = g[y, c]
    rb = ppg_redblue_oracle(out, pattern, clamp_input=True)
    for y in range(h):
        for c in range(w):
            if not (16 <= c < w - 16 and 16 <= y < h - 16):
                out[y, c] = rb[y, c]

    # populate (rcd.cu:30-46)
    cfa = np.zeros(h * w)
    rgb = [np.zeros(h * w), np.zeros(h * w), np.zeros(h * w)]
    for row in range(h):
        for col in range(w):
            idx = row * w + col
            val = max(0.0, x[row, col])
            code = fc(row, col, pattern)
            chan = 1 if code in (1, 3) else (0 if code == 0 else 2)
            cfa[idx] = val
            rgb[chan][idx] = val

    VP = np.zeros(h * w)  # v_diff then p_diff (aliased)
    HQ = np.zeros(h * w)  # h_diff then q_diff (aliased)
    VH = np.zeros(h * w)
    lpf_PQ = np.zeros(h * w)  # lpf then PQ_dir (aliased)

    # step 1.1
    for row in range(3, h - 3):
        for col in range(3, w - 3):
            idx = row * w + col
            VP[idx] = (cfa[idx - 3 * w] - 3 * cfa[idx - 2 * w] - cfa[idx - w]
                       + 6 * cfa[idx] - cfa[idx + w] - 3 * cfa[idx + 2 * w]
                       + cfa[idx + 3 * w]) ** 2
            HQ[idx] = (cfa[idx - 3] - 3 * cfa[idx - 2] - cfa[idx - 1]
                       + 6 * cfa[idx] - cfa[idx + 1] - 3 * cfa[idx + 2]
                       + cfa[idx + 3]) ** 2
    # step 1.2
    for row in range(2, h - 2):
        for col in range(2, w - 2):
            idx = row * w + col
            v_stat = max(epssq, VP[idx - w] + VP[idx] + VP[idx + w])
            h_stat = max(epssq, HQ[idx - 1] + HQ[idx] + HQ[idx + 1])
            VH[idx] = v_stat / (v_stat + h_stat)
    # step 2.1 (guard: col > w-2 || row > h-2)
    for row in range(2, h - 1):
        col0 = 2 + (fc(row, 0, pattern) & 1)
        for col in range(col0, w - 1, 2):
            idx = row * w + col
            lpf_PQ[idx // 2] = (
                cfa[idx]
                + 0.5 * (cfa[idx - w] + cfa[idx + w] + cfa[idx - 1] + cfa[idx + 1])
                + 0.25 * (cfa[idx - w - 1] + cfa[idx - w + 1] + cfa[idx + w - 1] + cfa[idx + w + 1])
            )
    # step 3.1
    for row in range(4, h - 4):
        col0 = 4 + (fc(row, 0, pattern) & 1)
        for col in range(col0, w - 4, 2):
            idx = row * w + col
            lidx = idx // 2
            vh_c = VH[idx]
            vh_n = 0.25 * (VH[idx - w - 1] + VH[idx - w + 1] + VH[idx + w - 1] + VH[idx + w + 1])
            vh_d = vh_n if abs(0.5 - vh_c) < abs(0.5 - vh_n) else vh_c
            cfai = cfa[idx]
            n_g = eps + abs(cfa[idx - w] - cfa[idx + w]) + abs(cfai - cfa[idx - 2 * w]) + abs(cfa[idx - w] - cfa[idx - 3 * w]) + abs(cfa[idx - 2 * w] - cfa[idx - 4 * w])
            s_g = eps + abs(cfa[idx + w] - cfa[idx - w]) + abs(cfai - cfa[idx + 2 * w]) + abs(cfa[idx + w] - cfa[idx + 3 * w]) + abs(cfa[idx + 2 * w] - cfa[idx + 4 * w])
            w_g = eps + abs(cfa[idx - 1] - cfa[idx + 1]) + abs(cfai - cfa[idx - 2]) + abs(cfa[idx - 1] - cfa[idx - 3]) + abs(cfa[idx - 2] - cfa[idx - 4])
            e_g = eps + abs(cfa[idx + 1] - cfa[idx - 1]) + abs(cfai - cfa[idx + 2]) + abs(cfa[idx + 1] - cfa[idx + 3]) + abs(cfa[idx + 2] - cfa[idx + 4])
            lpfi = lpf_PQ[lidx]
            n_e = cfa[idx - w] * (lpfi + lpfi) / (eps + lpfi + lpf_PQ[lidx - w])
            s_e = cfa[idx + w] * (lpfi + lpfi) / (eps + lpfi + lpf_PQ[lidx + w])
            w_e = cfa[idx - 1] * (lpfi + lpfi) / (eps + lpfi + lpf_PQ[lidx - 1])
            e_e = cfa[idx + 1] * (lpfi + lpfi) / (eps + lpfi + lpf_PQ[lidx + 1])
            v_est = (s_g * n_e + n_g * s_e) / (n_g + s_g)
            h_est = (w_g * e_e + e_g * w_e) / (e_g + w_g)
            rgb[1][idx] = v_est * (1 - vh_d) + h_est * vh_d
    # step 4.1 (odd cols)
    for row in range(3, h - 3):
        for col in range(3, w - 3, 2):
            idx = row * w + col
            VP[idx // 2] = ((cfa[idx - 3 * w - 3] - cfa[idx - w - 1] - cfa[idx + w + 1] + cfa[idx + 3 * w + 3]) - 3 * (cfa[idx - 2 * w - 2] + cfa[idx + 2 * w + 2]) + 6 * cfa[idx]) ** 2
            HQ[idx // 2] = ((cfa[idx - 3 * w + 3] - cfa[idx - w + 1] - cfa[idx + w - 1] + cfa[idx + 3 * w - 3]) - 3 * (cfa[idx - 2 * w + 2] + cfa[idx + 2 * w - 2]) + 6 * cfa[idx]) ** 2
    # step 4.2
    for row in range(2, h - 2):
        col0 = 2 + (fc(row, 0, pattern) & 1)
        for col in range(col0, w - 2, 2):
            idx = row * w + col
            idx2 = idx // 2
            idx3 = (idx - w - 1) // 2
            idx4 = (idx + w - 1) // 2
            p_stat = max(epssq, VP[idx3] + VP[idx2] + VP[idx4 + 1])
            q_stat = max(epssq, HQ[idx3 + 1] + HQ[idx2] + HQ[idx4])
            lpf_PQ[idx2] = p_stat / (p_stat + q_stat)
    # step 5.1
    for row in range(4, h - 3):
        col0 = 4 + (fc(row, 0, pattern) & 1)
        for col in range(col0, w - 3, 2):
            idx = row * w + col
            color = 2 - fc(row, col, pattern)
            rgbc = rgb[color]
            pqidx = idx // 2
            pqidx2 = (idx - w - 1) // 2
            pqidx3 = (idx + w - 1) // 2
            pq_c = lpf_PQ[pqidx]
            pq_n = 0.25 * (lpf_PQ[pqidx2] + lpf_PQ[pqidx2 + 1] + lpf_PQ[pqidx3] + lpf_PQ[pqidx3 + 1])
            pq_d = pq_n if abs(0.5 - pq_c) < abs(0.5 - pq_n) else pq_c
            nw_g = eps + abs(rgbc[idx - w - 1] - rgbc[idx + w + 1]) + abs(rgbc[idx - w - 1] - rgbc[idx - 3 * w - 3]) + abs(rgb[1][idx] - rgb[1][idx - 2 * w - 2])
            ne_g = eps + abs(rgbc[idx - w + 1] - rgbc[idx + w - 1]) + abs(rgbc[idx - w + 1] - rgbc[idx - 3 * w + 3]) + abs(rgb[1][idx] - rgb[1][idx - 2 * w + 2])
            sw_g = eps + abs(rgbc[idx - w + 1] - rgbc[idx + w - 1]) + abs(rgbc[idx + w - 1] - rgbc[idx + 3 * w - 3]) + abs(rgb[1][idx] - rgb[1][idx + 2 * w - 2])
            se_g = eps + abs(rgbc[idx - w - 1] - rgbc[idx + w + 1]) + abs(rgbc[idx + w + 1] - rgbc[idx + 3 * w + 3]) + abs(rgb[1][idx] - rgb[1][idx + 2 * w + 2])
            nw_e = rgbc[idx - w - 1] - rgb[1][idx - w - 1]
            ne_e = rgbc[idx - w + 1] - rgb[1][idx - w + 1]
            sw_e = rgbc[idx + w - 1] - rgb[1][idx + w - 1]
            se_e = rgbc[idx + w + 1] - rgb[1][idx + w + 1]
            p_e = (nw_g * se_e + se_g * nw_e) / (nw_g + se_g)
            q_e = (ne_g * sw_e + sw_g * ne_e) / (ne_g + sw_g)
            rgbc[idx] = rgb[1][idx] + (p_e * (1 - pq_d) + q_e * pq_d)
    # step 5.2
    for row in range(4, h - 3):
        col0 = 4 + (fc(row, 1, pattern) & 1)
        for col in range(col0, w - 3, 2):
            idx = row * w + col
            vh_c = VH[idx]
            vh_n = 0.25 * (VH[idx - w - 1] + VH[idx - w + 1] + VH[idx + w - 1] + VH[idx + w + 1])
            vh_d = vh_n if abs(0.5 - vh_c) < abs(0.5 - vh_n) else vh_c
            rgbi1 = rgb[1][idx]
            n1 = eps + abs(rgbi1 - rgb[1][idx - 2 * w])
            s1 = eps + abs(rgbi1 - rgb[1][idx + 2 * w])
            w1 = eps + abs(rgbi1 - rgb[1][idx - 2])
            e1 = eps + abs(rgbi1 - rgb[1][idx + 2])
            g1mw, g1pw = rgb[1][idx - w], rgb[1][idx + w]
            g1m1, g1p1 = rgb[1][idx - 1], rgb[1][idx + 1]
            for color in (0, 2):
                rgbc = rgb[color]
                sn = abs(rgbc[idx - w] - rgbc[idx + w])
                ew = abs(rgbc[idx - 1] - rgbc[idx + 1])
                n_g = n1 + sn + abs(rgbc[idx - w] - rgbc[idx - 3 * w])
                s_g = s1 + sn + abs(rgbc[idx + w] - rgbc[idx + 3 * w])
                w_g = w1 + ew + abs(rgbc[idx - 1] - rgbc[idx - 3])
                e_g = e1 + ew + abs(rgbc[idx + 1] - rgbc[idx + 3])
                n_e = rgbc[idx - w] - g1mw
                s_e = rgbc[idx + w] - g1pw
                w_e = rgbc[idx - 1] - g1m1
                e_e = rgbc[idx + 1] - g1p1
                v_est = (n_g * s_e + s_g * n_e) / (n_g + s_g)
                h_est = (e_g * w_e + w_g * e_e) / (e_g + w_g)
                rgbc[idx] = rgb[1][idx] + (v_est * (1 - vh_d) + h_est * vh_d)
    # write output (margin 7)
    for row in range(7, h - 7):
        for col in range(7, w - 7):
            idx = row * w + col
            out[row, col] = [max(0.0, rgb[0][idx]), max(0.0, rgb[1][idx]), max(0.0, rgb[2][idx])]
    return out


# --- postprocess (postprocess.cu) -------------------------------------------

def color_smoothing_oracle(rgb):
    """color_smoothing_kernel (postprocess.cu:24-78): 3x3 median of R-G/B-G
    with zero-fill outside the image."""
    h, w = rgb.shape[:2]
    out = np.zeros_like(rgb)

    def b(y, c):
        if 0 <= y < h and 0 <= c < w:
            return rgb[y, c]
        return np.zeros(3)

    for y in range(h):
        for c in range(w):
            rg = sorted(b(y + dy, c + dx)[0] - b(y + dy, c + dx)[1]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            bg = sorted(b(y + dy, c + dx)[2] - b(y + dy, c + dx)[1]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            g = rgb[y, c][1]
            out[y, c] = [max(rg[4] + g, 0.0), max(g, 0.0), max(bg[4] + g, 0.0)]
    return out


def green_eq_local_oracle(rgb, pattern, threshold):
    """green_eq_local_kernel (postprocess.cu:84-169)."""
    h, w = rgb.shape[:2]
    out = rgb.copy()

    def g(y, c):
        if 0 <= y < h and 0 <= c < w:
            return rgb[y, c][1]
        return 0.0

    maximum = 1.0
    for y in range(h):
        for c in range(w):
            code = fc(y, c, pattern)
            o = rgb[y, c][1]
            if code == 1 and (y & 1):
                o1 = [g(y - 1, c - 1), g(y - 1, c + 1), g(y + 1, c - 1), g(y + 1, c + 1)]
                o2 = [g(y - 2, c), g(y + 2, c), g(y, c - 2), g(y, c + 2)]
                m1, m2 = sum(o1) / 4.0, sum(o2) / 4.0
                if m2 > 0.0 and m1 > 0.0 and m1 / m2 < maximum * 2.0:
                    c1 = (abs(o1[0] - o1[1]) + abs(o1[0] - o1[2]) + abs(o1[0] - o1[3])
                          + abs(o1[1] - o1[2]) + abs(o1[2] - o1[3]) + abs(o1[1] - o1[3])) / 6.0
                    c2 = (abs(o2[0] - o2[1]) + abs(o2[0] - o2[2]) + abs(o2[0] - o2[3])
                          + abs(o2[1] - o2[2]) + abs(o2[2] - o2[3]) + abs(o2[1] - o2[3])) / 6.0
                    if o < maximum * 0.95 and c1 < maximum * threshold and c2 < maximum * threshold:
                        o *= m1 / m2
            out[y, c][1] = max(o, 0.0)
    return out


def green_eq_global_oracle(rgb, pattern):
    """green_eq_global reduce+apply (postprocess.cu:175-255)."""
    h, w = rgb.shape[:2]
    sum1 = sum2 = 0.0
    for y in range(h):
        for c in range(w):
            if c < 2 * (w // 2) and y < 2 * (h // 2):
                if fc(y, c, pattern) == 1 and not (y & 1):
                    sum1 += rgb[y, c][1]
                elif fc(y, c, pattern) == 1 and (y & 1):
                    sum2 += rgb[y, c][1]
    ratio = sum2 / sum1 if (sum1 > 0 and sum2 > 0) else 1.0
    out = rgb.copy()
    for y in range(h):
        for c in range(w):
            px = out[y, c]
            if fc(y, c, pattern) == 1 and not (y & 1):
                px[1] *= ratio
            out[y, c] = np.maximum(px, 0.0)
    return out


# --- bilateral grid (bilateral.cu) ------------------------------------------

def bilateral_oracle(lum, sigma_s, sigma_r, detail):
    """Literal BilateralImpl::process (bilateral.cu:358-385): trilinear
    scatter splat, blur_line x/y, blur_line_z derivative, trilinear slice."""
    import math

    h, w = lum.shape
    l_range = 1.0
    ss = max(sigma_s, 0.5)
    gx = min(max(round(w / ss), 4.0), 3000.0)
    gy = min(max(round(h / ss), 4.0), 3000.0)
    gz = min(max(round(l_range / sigma_r), 4.0), 50.0)
    eff_s = max(h / gy, w / gx)
    eff_r = l_range / gz
    sx = int(math.ceil(w / eff_s)) + 1
    sy = int(math.ceil(h / eff_s)) + 1
    sz = int(math.ceil(l_range / eff_r)) + 1

    def sample(px, py, L):
        gxx = min(max(px / sigma_s, 0.0), sx - 1)
        gyy = min(max(py / sigma_s, 0.0), sy - 1)
        gzz = min(max(L / sigma_r, 0.0), sz - 1)
        ib = (min(int(gxx), sx - 2), min(int(gyy), sy - 2), min(int(gzz), sz - 2))
        fr = (gxx - ib[0], gyy - ib[1], gzz - ib[2])
        return ib, fr

    grid = np.zeros((sz, sy, sx))
    contrib = 1.0 / (sigma_s * sigma_s)
    for py in range(h):
        for px in range(w):
            (ix, iy, iz), (fx, fy, fz) = sample(px, py, lum[py, px])
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                               * (fz if dz else 1 - fz))
                        grid[iz + dz, iy + dy, ix + dx] += contrib * wgt

    def blur_line(buf, axis, weights):
        """Truncated 5-tap correlation (blur_line, bilateral.cu:132-168)."""
        out = np.zeros_like(buf)
        n = buf.shape[axis]
        for i in range(n):
            acc = 0.0
            for t, wgt in enumerate(weights):
                j = i + t - 2
                if 0 <= j < n:
                    acc = acc + wgt * np.take(buf, j, axis=axis)
            out_idx = [slice(None)] * 3
            out_idx[axis] = i
            out[tuple(out_idx)] = acc
        return out

    wg = [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]
    wd = [-2 / 16, -4 / 16, 0.0, 4 / 16, 2 / 16]
    grid = blur_line(grid, 2, wg)   # x
    grid = blur_line(grid, 1, wg)   # y
    grid = blur_line(grid, 0, wd)   # z derivative

    out = np.zeros((h, w))
    norm = -detail * sigma_r * 4.0
    for py in range(h):
        for px in range(w):
            L = lum[py, px]
            (ix, iy, iz), (fx, fy, fz) = sample(px, py, L)
            acc = 0.0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                               * (fz if dz else 1 - fz))
                        acc += grid[iz + dz, iy + dy, ix + dx] * wgt
            out[py, px] = max(0.0, L + norm * acc)
    return out


# --- local laplacian (laplacian.cu) ------------------------------------------

def laplacian_oracle(mono, num_gamma=6, sigma=0.2, shadows=1.0, highlights=1.0,
                     clarity=0.0):
    """Literal LaplacianImpl::process (laplacian.cu:392-610) with fp16
    storage between stages."""
    import math

    h, w = mono.shape
    n_levels = min(30, int(math.floor(math.log2(min(w, h)))))
    max_supp = 1 << (n_levels - 1)
    bw, bh = w + 2 * max_supp, h + 2 * max_supp

    def dl(x, l):
        return (x + (1 << l) - 1) >> l

    wk = [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]

    def f16(a):
        return a.astype(np.float16)

    # pad_input_half: clamp-to-edge
    padded0 = np.empty((bh, bw))
    for y in range(bh):
        for x in range(bw):
            cy = min(max(y - max_supp, 0), h - 1)
            cx = min(max(x - max_supp, 0), w - 1)
            padded0[y, x] = mono[cy, cx]
    padded0 = f16(padded0)

    def gauss_reduce(fine, ch, cw):
        out = np.empty((ch, cw))
        ff = fine.astype(np.float64)
        for py in range(ch):
            cy = py
            if py >= ch - 1:
                cy = ch - 2
            if cy <= 0:
                cy = 1
            for px in range(cw):
                cx = px
                if px >= cw - 1:
                    cx = cw - 2
                if cx <= 0:
                    cx = 1
                acc = 0.0
                for j in range(-2, 3):
                    for i in range(-2, 3):
                        acc += ff[2 * cy + j, 2 * cx + i] * wk[i + 2] * wk[j + 2]
                out[py, px] = acc
        return f16(out)

    def curve(x):
        c = x - g_val
        ssig = sigma if c > 0 else -sigma
        shadhi = shadows if c > 0 else highlights
        if abs(c) > 2 * sigma:
            val = g_val + ssig + shadhi * (c - ssig)
        else:
            t = min(max(c / (2 * ssig), 0.0), 1.0)
            val = g_val + ssig * 2 * (1 - t) * t + t * t * (ssig + ssig * shadhi)
        return val + clarity * c * math.exp(-c * c / (2 * sigma * sigma / 3.0))

    dims = [(dl(bh, l), dl(bw, l)) for l in range(n_levels)]
    padded = [padded0]
    for l in range(1, n_levels):
        padded.append(gauss_reduce(padded[l - 1], *dims[l]))

    processed = []
    for k in range(num_gamma):
        g_val = (k + 0.5) / num_gamma
        base = padded0.astype(np.float64)
        lvl0 = np.vectorize(curve)(base)
        pyr = [f16(lvl0)]
        for l in range(1, n_levels):
            pyr.append(gauss_reduce(pyr[l - 1], *dims[l]))
        processed.append(pyr)

    def clampb(pos, size):
        x, y = pos
        sw, sh = size
        if sw & 1:
            if x > sw - 2:
                x = sw - 2
        elif x > sw - 3:
            x = sw - 3
        if sh & 1:
            if y > sh - 2:
                y = sh - 2
        elif y > sh - 3:
            y = sh - 3
        if x <= 0:
            x = 1
        if y <= 0:
            y = 1
        return x, y

    def expand(coarse, pos):
        x, y = pos
        cf = coarse.astype(np.float64)
        cx, cy = x // 2, y // 2
        x_odd, y_odd = x & 1, y & 1
        i_r = (0, 1) if x_odd else (-1, 0, 1)
        j_r = (0, 1) if y_odd else (-1, 0, 1)
        acc = 0.0
        for i in i_r:
            for j in j_r:
                wi = 2 * i + 1 if x_odd else 2 * i + 2
                wj = 2 * j + 1 if y_odd else 2 * j + 2
                acc += cf[cy + j, cx + i] * wk[wi] * wk[wj]
        return 4.0 * acc

    output = padded[n_levels - 1]
    for l in range(n_levels - 2, -1, -1):
        fh, fw = dims[l]
        new_out = np.empty((fh, fw))
        pad_l = padded[l].astype(np.float64)
        for y in range(fh):
            for x in range(fw):
                cx, cy = clampb((x, y), (fw, fh))
                val = expand(output, (cx, cy))
                v = pad_l[y, x]
                hi = 1
                while hi < num_gamma - 1 and (hi + 0.5) / num_gamma <= v:
                    hi += 1
                lo = hi - 1
                a = min(max(v * num_gamma - (lo + 0.5), 0.0), 1.0)
                l0 = processed[lo][l].astype(np.float64)[y, x] - expand(processed[lo][l + 1], (cx, cy))
                l1 = processed[hi][l].astype(np.float64)[y, x] - expand(processed[hi][l + 1], (cx, cy))
                new_out[y, x] = val + l0 * (1 - a) + l1 * a
        output = f16(new_out)

    return output.astype(np.float64)[max_supp:max_supp + h, max_supp:max_supp + w]
