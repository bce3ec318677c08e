"""Overlapped-tile spectral Wiener denoise + channel noise estimation.

TPU-native rebuild of csrc/denoise/ (denoise.cu, fft.h, window.h).  The
reference runs one CUDA block per KxK tile with an in-register warp FFT and
atomic overlap-add.  The TPU design regroups the overlapping tiles into
overlap_factor^2 *non-overlapping* cosets (tiles whose grid indices are
congruent mod K/stride): each coset is a plain reshape of a reflect-indexed
slab of the image, the 2-D FFT becomes two small complex matmuls (a KxK DFT
is MXU food), and the overlap-add becomes coset-wise dense adds - no
scatters, no atomics, bit-deterministic.

Window generation matches window.h:17-42 (separable Gaussian, sum of squares
normalized to 1); the spectral gain matches apply_gain (denoise.cu:181-186);
tile/grid geometry matches WienerImpl::_process (denoise.cu:280-330),
including the asymmetric reflect indexing of reflect_index (denoise.cu:118).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

try:  # Pallas fused tile core (TPU); XLA einsum path remains the fallback
    from ..kernels.wiener_core import wiener_tile_core as _wiener_tile_core
except Exception:  # pragma: no cover - pallas unavailable on exotic setups
    _wiener_tile_core = None

_F32 = jnp.float32
_EPS = 1e-15


def _gaussian_window(k: int, weight: float) -> np.ndarray:
    """1-D Gaussian window, L2-normalized (window.h:17-42)."""
    half = k / 2.0
    scale = weight * half * half
    r = np.linspace(-half + 0.5, half - 0.5, k, dtype=np.float64)
    vals = np.exp(-(r * r) / scale)
    vals = vals / np.sqrt(np.sum(vals * vals))
    return vals.astype(np.float32)


def _reflect_index(idx: np.ndarray, limit: int) -> np.ndarray:
    """reflect_index (denoise.cu:118-122): mirror without edge repeat below 0,
    mirror with edge repeat above limit-1 (asymmetric, replicated exactly)."""
    idx = np.where(idx < 0, -idx, idx)
    idx = np.where(idx >= limit, 2 * limit - idx - 1, idx)
    return np.clip(idx, 0, limit - 1)


def _dft_matrix(k: int, inverse: bool) -> np.ndarray:
    n = np.arange(k)
    sign = 1.0 if inverse else -1.0
    m = np.exp(sign * 2j * np.pi * np.outer(n, n) / k)
    if inverse:
        m = m / k
    return m.astype(np.complex64)


def _rdft2_basis(k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Real 2-D DFT as two fat matmuls over flattened KxK tiles.

    The 2-D DFT of a real tile is determined by one representative of each
    conjugate frequency pair: X[u,v] = a - i*b with a = cos-row . x,
    b = sin-row . x, and |X|^2 = a^2 + b^2.  Packing [cos-rows; sin-rows]
    gives an analysis matrix A (2R, K^2) and a synthesis matrix Y (2R, K^2)
    with Y = w/K^2 * [cos; sin] rows (w = 1 for self-conjugate frequencies,
    2 for pairs), so tile -> A @ tile -> per-pair spectral gain -> Y^T @ s
    reconstructs exactly the reference's DFT -> gain -> IDFT round trip
    (denoise.cu:181-220) in 2 MXU matmuls instead of a chain of 12.

    Returns (analysis (2R, K^2), synthesis (2R, K^2), R).
    """
    coords = np.arange(k)
    xx, yy = np.meshgrid(coords, coords, indexing='ij')
    flat_x = xx.reshape(-1)
    flat_y = yy.reshape(-1)

    reps = []
    self_conj = []
    for u in range(k):
        for v in range(k):
            pu, pv = (k - u) % k, (k - v) % k
            if (u, v) <= (pu, pv):
                reps.append((u, v))
                self_conj.append((u, v) == (pu, pv))
    r = len(reps)  # = K^2/2 + 2 for even K

    ang = np.zeros((r, k * k), dtype=np.float64)
    for i, (u, v) in enumerate(reps):
        ang[i] = 2.0 * np.pi * (u * flat_x + v * flat_y) / k
    cos_rows = np.cos(ang)
    sin_rows = np.sin(ang)
    sin_rows[np.asarray(self_conj)] = 0.0

    analysis = np.concatenate([cos_rows, sin_rows], axis=0)
    w = np.where(np.asarray(self_conj), 1.0, 2.0)[:, None] / (k * k)
    synthesis = np.concatenate([cos_rows * w, sin_rows * w], axis=0)
    return analysis.astype(np.float32), synthesis.astype(np.float32), r


def _sep_bases(k: int, wf: np.ndarray, wi: np.ndarray):
    """Bases for the separable windowed-DFT formulation (numpy, trace time).

    The 2-D windowed DFT factorizes: X[u,v] = sum_j wf[j] e^{-ivj} *
    (sum_i wf[i] e^{-iui} x[i,j]), so the fat (K^2 -> ~K^2/2) analysis
    matmul becomes two K->K passes - ~12x fewer MXU FLOPs per tile.  Rows
    u in [0, K/2] suffice (conjugate symmetry in u); the synthesis weights
    rho_u in {1, 2} restore the dropped half.  The mean channel rides along
    as channel 2U (box row basis, (wf*wi) synthesis bases).
    """
    u_count = k // 2 + 1
    i = np.arange(k)
    u = np.arange(u_count)
    ang_u = 2.0 * np.pi * np.outer(i, u) / k  # (K, U)
    # Row analysis: (K taps, 2U + 1 channels): [cos_u * wf | sin_u * wf | 1]
    b_row = np.concatenate(
        [np.cos(ang_u) * wf[:, None], np.sin(ang_u) * wf[:, None], np.ones((k, 1))],
        axis=1,
    )
    v = np.arange(k)
    ang_v = 2.0 * np.pi * np.outer(v, i) / k  # (V, J)
    cos_c = (np.cos(ang_v) * wf[None, :]).T  # (J, V) analysis over columns
    sin_c = (np.sin(ang_v) * wf[None, :]).T
    cos_s = np.cos(ang_v) * wi[None, :]  # (V, J) synthesis over columns
    sin_s = np.sin(ang_v) * wi[None, :]
    # Packed column-analysis basis producing re|im spectra DIRECTLY from the
    # [cos_u | sin_u] row channels stacked on the tap axis (J = 2k rows):
    #   re[v,u] = sum_j (Fc[j,u] cos_c[j,v] - Fs[j,u] sin_c[j,v])
    #   im[v,u] = -sum_j (Fs[j,u] cos_c[j,v] + Fc[j,u] sin_c[j,v])
    # Halves the spectral intermediate vs computing all (v, f) products and
    # combining afterwards (the dominant HBM tensor of the separable path).
    b_reim = np.block([[cos_c, -sin_c], [-sin_c, -cos_c]])  # (2J, [re_v|im_v])
    # Spectrum of the analysis window (for the folded mean subtraction).
    w2f = np.outer(wf, wf)
    w_hat = np.fft.fft2(w2f)[:u_count, :]  # (U, K) complex
    # Row synthesis: (2U + 1 channels, K rows): rho/K^2-weighted inverse.
    rho = np.where((u == 0) | (u == k // 2), 1.0, 2.0) / (k * k)
    row_cos = (np.cos(ang_u) * wi[:, None] * rho[None, :]).T  # (U, K)
    row_sin = (-np.sin(ang_u) * wi[:, None] * rho[None, :]).T
    b_row_syn = np.concatenate([row_cos, row_sin, (wf * wi)[None, :]], axis=0)
    # Synthesis block [[cos, sin], [-sin, cos]] (2V, 2J): [S_re; S_im] ->
    # [T_re; T_im] in one pass.
    cs_s = np.block([[cos_s, sin_s], [-sin_s, cos_s]])
    # Column-interleaved variant: output column m' = 2j + half emits the
    # (j, re|im) pairs adjacent, so the einsum result reshapes FOR FREE to
    # (..., j, [re_f | im_f], ...) - the overlap-add layout.  Without this
    # the tail pays a slice+concat relayout of the full tile tensor
    # (~884 MB at 12MP ov=4, measured ~1/3 of the stage).
    perm = np.empty(2 * k, dtype=np.int64)
    perm[0::2] = np.arange(k)
    perm[1::2] = np.arange(k) + k
    cs_s2 = cs_s[:, perm]
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    return dict(
        u_count=u_count,
        b_row=f32(b_row),
        b_reim=f32(b_reim),
        cs_s=f32(cs_s),
        cs_s2=f32(cs_s2),
        w_hat_re=f32(w_hat.real.copy()),
        w_hat_im=f32(w_hat.imag.copy()),
        b_row_syn=f32(b_row_syn),
        b_row_syn_spec=f32(b_row_syn[:-1]),  # cos/sin rows, mean row split off
        wfwi=f32(wf * wi),
    )


def _wiener_separable(xr, h, w, c, k, ov, sigmas, wf, wi, mrow, mcol, hp_a, hp_s,
                      spectral_dtype=None, storage_dtype=None):
    """Separable-DFT Wiener core on the reflect-padded image `xr`.

    Grid/crop geometry is identical to the stacked-coset path: tile (gy, gx)
    has top-left (gy - ov)*stride in image coords = (gy*stride, gx*stride)
    in padded/accumulator coords.  Within row-coset p (gy = p + ov*r) tiles
    are stride-K dense, so every stage is reshapes + K-contractions + ov^2
    static shifted adds - no gathers, no scatters.
    """
    stride = k // ov
    grid_h = (h + k + stride - 1) // stride + ov
    grid_w = (w + k + stride - 1) // stride + ov
    n_ty = -(-grid_h // ov)
    n_tx = -(-grid_w // ov)
    bb = _sep_bases(k, wf, wi)
    uc = bb['u_count']

    acc_h = (ov - 1) * stride + n_ty * k
    acc_w = (ov - 1) * stride + n_tx * k
    # xr covers [0, h + k + pad_hi); all coset windows stay inside it.
    assert xr.shape[0] >= acc_h and xr.shape[1] >= acc_w, (xr.shape, acc_h, acc_w)

    sig2 = (sigmas * sigmas).reshape(1, 1, 1, 1, 1, -1)

    # Low-precision STORAGE (not math): the chain's big intermediates are
    # materialized in `storage_dtype`/`spectral_dtype` (f16 halves their HBM
    # bytes) and upcast to f32 AT THE POINT OF USE - the convert fuses into
    # the consuming dot/elementwise fusion, so only the narrow bytes cross
    # HBM while every matmul and the gain arithmetic stay f32.  Writing it
    # as `.astype(f16).astype(f32)` instead leaves XLA free to materialize
    # the f32 copy, which it does: measured 39.2 ms vs 28.2 ms at 12MP
    # ov=4 for the use-point form.  f16 (not bf16): the spectra need the
    # mantissa - bf16 storage measures 1.4e-3+ oracle error (over the 1e-3
    # budget), f16 4e-4 (tests/test_wiener.py::test_f16_storage_error_budget).
    _store = lambda t, dt: t if dt is None else t.astype(dt)
    _use = lambda t: t if t.dtype == _F32 else t.astype(_F32)

    # ---- row analysis: ONE stacked window tensor + ONE einsum ----
    # (per-HLO-op overhead dominates this backend: every stage is a single
    # stacked op over all ov row/col cosets rather than ov separate chains)
    win = jnp.stack([
        xr[p * stride : p * stride + n_ty * k, :acc_w] for p in range(ov)
    ]).reshape(ov, n_ty, k, acc_w, c)
    rout = _store(
        jnp.einsum('ptkwc,kf->ptwfc', win, bb['b_row'], precision=hp_a),
        storage_dtype,
    )

    # ---- column analysis: packed re|im basis, one einsum ----
    # Stack the cos_u / sin_u row channels on the tap axis (J = 2k) so the
    # contraction yields the re|im spectrum directly - no (v, f) cross
    # tensor twice this size (see _sep_bases b_reim).
    cwin = jnp.stack([
        rout[:, :, q * stride : q * stride + n_tx * k] for q in range(ov)
    ], axis=2).reshape(ov, n_ty, ov, n_tx, k, 2 * uc + 1, c)
    g_all = jnp.concatenate(
        [cwin[..., :uc, :], cwin[..., uc : 2 * uc, :]], axis=4
    )  # (ov, n_ty, ov, n_tx, 2k, uc, c)
    reim = _store(
        jnp.einsum('ptqxjuc,jv->ptqxvuc', _use(g_all), bb['b_reim'],
                   precision=hp_a),
        spectral_dtype,
    )
    re_x = _use(reim[..., :k, :, :])
    im_x = _use(reim[..., k:, :, :])
    # (ov, n_ty, ov, n_tx, C); f32 accumulation even from f16 storage
    mean = _use(cwin[..., 2 * uc, :]).sum(axis=4) / (k * k)

    # ---- mean-corrected spectral gain (denoise.cu:181-186) ----
    m_b = mean[:, :, :, :, None, None, :]
    w_re = bb['w_hat_re'].T[None, None, None, None, :, :, None]  # (V, U) view
    w_im = bb['w_hat_im'].T[None, None, None, None, :, :, None]
    re_t = re_x - m_b * w_re
    im_t = im_x - m_b * w_im
    power = re_t * re_t + im_t * im_t + _EPS
    gain = jnp.maximum(power - sig2[..., None, :], 0.0) / power
    # Pack [S_re | S_im] on the v axis for the one-pass column synthesis.
    s_all = _store(jnp.concatenate([re_t * gain, im_t * gain], axis=4),
                   spectral_dtype)

    # ---- column synthesis: interleaved basis (cs_s2, column m' = 2j+half)
    # emits (j, re|im) adjacent, so the (..., 2K, U, c) output is a FREE
    # reshape to (..., K, 2U, c) - the exact channel layout the row
    # synthesis expects.  The old block basis needed an 884 MB slice+concat
    # relayout here.  The tile-mean channel leaves the tile tensor entirely:
    # its contribution is separable (mean * u[col] * u[row], u = wf*wi) and
    # is synthesized below at grid resolution (~6 MB instead of riding a
    # 35th channel through every full-size tensor + a concat copy).
    t_all = _store(
        jnp.einsum('ptqxvfc,vm->ptqxmfc', _use(s_all), bb['cs_s2'],
                   precision=hp_s).reshape(ov, n_ty, ov, n_tx, k, 2 * uc, c),
        storage_dtype,
    )

    # ---- column overlap-add: pad + one add tree (a DUS chain would make
    # ov sequential read-modify-write passes over the accumulator); the
    # upcast fuses into the adds, so accumulation is f32 over f16 bytes ----
    cacc = sum(
        jnp.pad(
            _use(t_all[:, :, q]).reshape(ov, n_ty, n_tx * k, -1, c),
            ((0, 0), (0, 0),
             (q * stride, acc_w - n_tx * k - q * stride), (0, 0), (0, 0)),
        )
        for q in range(ov)
    )

    # Mean path, column overlap-add at grid resolution.
    u_col = bb['wfwi']  # (K,) = wf * wi
    mpiece = mean[..., None, :] * u_col[None, None, None, None, :, None]
    macc = sum(
        jnp.pad(
            mpiece[:, :, q].reshape(ov, n_ty, n_tx * k, c),
            ((0, 0), (0, 0), (q * stride, acc_w - n_tx * k - q * stride), (0, 0)),
        )
        for q in range(ov)
    )  # (ov, n_ty, acc_w, c)

    # ---- row synthesis (one einsum) + mean broadcast + row overlap-add ----
    y = _store(
        jnp.einsum('ptwfc,fk->ptkwc', cacc, bb['b_row_syn_spec'], precision=hp_s),
        storage_dtype,
    )
    yfull = _use(y) + macc[:, :, None, :, :] * u_col[None, None, :, None, None]
    out = sum(
        jnp.pad(
            yfull[p].reshape(n_ty * k, acc_w, c),
            ((p * stride, acc_h - n_ty * k - p * stride), (0, 0), (0, 0)),
        )
        for p in range(ov)
    )

    mask = mrow[:, None] * mcol[None, :]
    return out[k : k + h, k : k + w] / (mask[k : k + h, k : k + w, None] + _EPS)


def wiener_denoise(
    image,
    noise_sigmas,
    tile_size: int = 32,
    overlap_factor: int = 4,
    fft_scale: float = 0.3,
    interp_scale: float = 0.3,
    precision=jax.lax.Precision.HIGH,
    use_pallas: bool | None = None,
    use_separable: bool = True,
    spectral_dtype=None,
    storage_dtype=None,
    _pallas_interpret: bool = False,
):
    """Wiener-filter an (H, W, C) image, C in {1, 3}.

    Args:
        image: (H, W, C) float32.
        noise_sigmas: scalar or (C,) per-channel noise sigma.
        tile_size: K in {16, 32}.
        overlap_factor: 2, 4, or 8; tile stride = K / overlap_factor.
        precision: MXU precision for the DFT matmuls - one value for both,
            or an (analysis, synthesis) pair.  HIGH emulates the reference's
            fp32 cuFFT round trip (denoise.cu:181-220); DEFAULT runs
            single-pass bf16 - measurably faster, bounded extra error.
        spectral_dtype: optional low-precision STORAGE dtype for the two
            spectral tensors (reim, s_all); math stays f32.  f16 measures
            ~2e-4 extra oracle error; bf16 measures 1.4e-3+ (over the 1e-3
            parity budget) and should not be used.
        storage_dtype: same, for the row-spectrum / reconstructed-tile /
            row-synthesis tensors (rout, t_all, y).  f16 for both knobs
            halves the stage's HBM traffic: 41 -> 25 ms at 12MP ov=4 on
            v5e, total oracle error 4e-4 (the pipeline default via
            ImageProcessingSettings.denoise_f16).
        use_pallas: run the DFT->gain->IDFT core as one fused Pallas kernel
            (kernels/wiener_core.py).  Off by default: measured ~5% SLOWER
            than the XLA path on v5e (184.6 vs 174.7 ms, 12MP/3ch) - the
            einsum formulation is already matmul-bound and XLA's internal
            canonicalization performs the same tile permute the kernel
            boundary forces explicitly.  Retained as the fused-kernel
            template and for future Mosaic improvements.

    Returns:
        (H, W, C) float32 denoised image.
    """
    x = jnp.asarray(image, dtype=_F32)
    if x.ndim == 2:
        x = x[..., None]
    if x.ndim != 3 or x.shape[-1] not in (1, 3):
        raise RuntimeError(
            f'image must be (H, W) or (H, W, C) with C in {{1, 3}}, '
            f'got shape {tuple(jnp.asarray(image).shape)}'
        )
    h, w, c = x.shape
    k = tile_size
    if k not in (16, 32):
        raise ValueError(f'tile_size must be 16 or 32, got {k}')
    if overlap_factor not in (2, 4, 8):
        raise ValueError(f'overlap_factor must be 2, 4, or 8, got {overlap_factor}')

    sigmas = jnp.broadcast_to(jnp.asarray(noise_sigmas, dtype=_F32).reshape(-1), (c,))

    stride = k // overlap_factor
    ov = overlap_factor
    h_pad, w_pad = h + 2 * k, w + 2 * k
    # grid counts (denoise.cu:288-291): grid_start = -(K/stride)
    grid_h = (h + k + stride - 1) // stride + ov
    grid_w = (w + k + stride - 1) // stride + ov

    wf = _gaussian_window(k, fft_scale)
    wi = _gaussian_window(k, interp_scale)
    wf_j = jnp.asarray(wf)
    wi_j = jnp.asarray(wi)

    acc = jnp.zeros((h_pad, w_pad, c), dtype=_F32)

    # The overlap-add weight mask is input-independent and separable: the 2-D
    # window is an outer product and tiles sit on a regular grid, so
    # mask(y, x) = mrow(y) * mcol(x).  Computed in numpy at trace time.
    wprod = wf * wi

    def _mask_1d(n_pad, grid_n):
        m = np.zeros(n_pad, dtype=np.float64)
        for g in range(grid_n):
            o = g * stride  # out position (g - ov)*stride + K
            end = min(o + k, n_pad)
            if end > o:
                m[o:end] += wprod[: end - o]
        return m.astype(np.float32)

    mrow = jnp.asarray(_mask_1d(h_pad, grid_h))
    mcol = jnp.asarray(_mask_1d(w_pad, grid_w))

    hp_a, hp_s = precision if isinstance(precision, tuple) else (precision, precision)
    analysis, synthesis, n_rep = _rdft2_basis(k)
    # Fold the analysis window and the per-tile mean into the bases:
    #   A @ ((t - m) * wf2) = (A*wf2) @ t - m * (A @ wf2)
    # with the mean extracted by an appended ones/K^2 row, and
    #   ((Syn^T @ s) + m*wf2) * wi2 = (Syn*wi2)^T @ s + m*(wf2*wi2).
    # One matmul in, one out - no windowed-tile intermediate and no separate
    # strided tile-mean reduction (which costs ~16 ms at 12MP here).
    w2f_np = np.outer(wf, wf).astype(np.float64)
    w2i_np = np.outer(wi, wi).astype(np.float64)
    ana_w = analysis.astype(np.float64) * w2f_np.reshape(1, -1)
    ana_aug_np = np.concatenate(
        [ana_w, np.full((1, k * k), 1.0 / (k * k))], axis=0
    ).astype(np.float32)
    syn_w_np = (
        synthesis.astype(np.float64) * w2i_np.reshape(1, -1)
    ).astype(np.float32)
    a0_j = jnp.asarray(ana_w.sum(axis=1).astype(np.float32))
    ana3 = jnp.asarray(ana_aug_np.reshape(-1, k, k))
    syn3 = jnp.asarray(syn_w_np.reshape(-1, k, k))
    mc_j = jnp.asarray((w2f_np * w2i_np).astype(np.float32))
    sig2 = (sigmas * sigmas)[None, None, :, None]  # (1, 1, C, 1)

    # Reflect-pad once (asymmetric modes matching reflect_index) so every
    # coset slab is a contiguous slice - XLA gathers are slow on TPU.  The
    # bottom/right pad must cover the maximal (padded-to-uniform) coset slab;
    # small images (reflection wider than the image) fall back to gathers.
    n_ty_max = -(-grid_h // ov)
    n_tx_max = -(-grid_w // ov)
    pad_lo = k
    pad_hi_r = max(2 * k, n_ty_max * k - stride - h)
    pad_hi_c = max(2 * k, n_tx_max * k - stride - w)
    fast = h > pad_hi_r and w > pad_hi_c
    if fast:
        xr = jnp.concatenate([x[1 : pad_lo + 1][::-1], x, x[::-1][:pad_hi_r]], axis=0)
        xr = jnp.concatenate(
            [xr[:, 1 : pad_lo + 1][:, ::-1], xr, xr[:, ::-1][:, :pad_hi_c]], axis=1
        )

    if use_pallas is None:
        use_pallas = False  # XLA path measured faster; see docstring
    use_pallas = use_pallas and fast and _wiener_tile_core is not None

    if use_separable and fast and not use_pallas:
        return _wiener_separable(
            xr, h, w, c, k, ov, sigmas, wf, wi, mrow, mcol, hp_a, hp_s,
            spectral_dtype=spectral_dtype, storage_dtype=storage_dtype,
        )

    if use_pallas:
        # Fused Pallas core: channel-planar slabs stacked on the grid axis
        # (G = C*ov^2), the whole DFT->gain->IDFT per tile-row in VMEM.
        # Mosaic cannot lane-reshape, so tiles are flattened XLA-side; the
        # permute fuses into the slab-build copy (it is the same transpose
        # XLA's einsum canonicalization performs internally on the fallback
        # path, moved out where the kernel boundary forces it anyway).
        gg = c * ov * ov
        slabs = jnp.stack([
            xr[
                pad_lo + (ry - ov) * stride : pad_lo + (ry - ov) * stride + n_ty_max * k,
                pad_lo + (rx - ov) * stride : pad_lo + (rx - ov) * stride + n_tx_max * k,
                ch,
            ]
            for ch in range(c)
            for ry in range(ov)
            for rx in range(ov)
        ])  # (C*ov^2, n_ty_max*K, n_tx_max*K)
        tiles_t = (
            slabs.reshape(gg, n_ty_max, k, n_tx_max, k)
            .transpose(0, 1, 3, 2, 4)
            .reshape(gg * n_ty_max, n_tx_max, k * k)
        )
        recon_t = _wiener_tile_core(
            tiles_t,
            jnp.asarray(ana_aug_np.T),
            jnp.asarray(syn_w_np),
            a0_j[None, :],
            mc_j.reshape(1, k * k),
            jnp.repeat(sigmas * sigmas, ov * ov * n_ty_max),
            n_rep=n_rep,
            interpret=_pallas_interpret,
        )
        recon_all = (
            recon_t.reshape(gg, n_ty_max, n_tx_max, k, k)
            .transpose(0, 1, 3, 2, 4)
            .reshape(gg, n_ty_max * k, n_tx_max * k)
        )
        chans = []
        g = 0
        for ch in range(c):
            acc_ch = 0.0
            for ry in range(ov):
                r0 = k - ry * stride
                for rx in range(ov):
                    c0 = k - rx * stride
                    acc_ch = acc_ch + recon_all[g, r0 : r0 + h, c0 : c0 + w]
                    g += 1
            chans.append(acc_ch)
        out_acc = jnp.stack(chans, axis=-1)
        mask = mrow[:, None] * mcol[None, :]
        return out_acc / (mask[k : k + h, k : k + w, None] + _EPS)

    if fast:
        # Batch all ov^2 cosets into ONE stacked tensor chain: this backend
        # has large per-HLO-op overhead, so 16 separate coset chains cost far
        # more than one 16x-bigger chain.  Slab grids are padded to the
        # maximal coset tile count (the reflect pad covers the over-read);
        # per-coset crops at accumulation drop the padding tiles.
        slabs = jnp.stack([
            xr[
                pad_lo + (ry - ov) * stride : pad_lo + (ry - ov) * stride + n_ty_max * k,
                pad_lo + (rx - ov) * stride : pad_lo + (rx - ov) * stride + n_tx_max * k,
            ]
            for ry in range(ov)
            for rx in range(ov)
        ])  # (ov^2, n_ty_max*K, n_tx_max*K, C)

        tiles = slabs.reshape(ov * ov, n_ty_max, k, n_tx_max, k, c)
        if c == 1:
            raw = jnp.einsum('ruv,gaubv->gabr', ana3, tiles[..., 0], precision=hp_a)
            mean = raw[..., -1:]
            spec = raw[..., :-1] - mean * a0_j
            a_part = spec[..., :n_rep]
            b_part = spec[..., n_rep:]
            power = a_part * a_part + b_part * b_part + _EPS
            gain = jnp.maximum(power - sig2[..., 0, :], 0.0) / power
            spec = jnp.concatenate([a_part * gain, b_part * gain], axis=-1)
            y = jnp.einsum('ruv,gabr->gaubv', syn3, spec, precision=hp_s)
            recon_all = (
                y + mean[:, :, None, :, :] * mc_j[None, None, :, None, :]
            ).reshape(ov * ov, n_ty_max * k, n_tx_max * k, 1)
        else:
            raw = jnp.einsum('ruv,gaubvc->gabcr', ana3, tiles, precision=hp_a)
            mean = raw[..., -1:]
            spec = raw[..., :-1] - mean * a0_j
            a_part = spec[..., :n_rep]
            b_part = spec[..., n_rep:]
            power = a_part * a_part + b_part * b_part + _EPS
            gain = jnp.maximum(power - sig2[None], 0.0) / power
            spec = jnp.concatenate([a_part * gain, b_part * gain], axis=-1)
            y = jnp.einsum('ruv,gabcr->gaubvc', syn3, spec, precision=hp_s)
            recon_all = (
                y + mean[..., 0][:, :, None, :, None, :]
                * mc_j[None, None, :, None, :, None]
            ).reshape(ov * ov, n_ty_max * k, n_tx_max * k, c)

        # Overlap-add as slice-and-sum: output pixel (r, c) receives coset
        # g's contribution at recon row K + r - ry*stride (always in range;
        # the uniform-padding tiles land at rows >= H and never reach the
        # crop).  16 static slices + one sum - no scatter into a padded
        # accumulator (dynamic-update-slices cost ~3 ms each here).
        out_acc = 0.0
        g = 0
        for ry in range(ov):
            r0 = k - ry * stride
            for rx in range(ov):
                c0 = k - rx * stride
                out_acc = out_acc + recon_all[g, r0 : r0 + h, c0 : c0 + w]
                g += 1
        mask = mrow[:, None] * mcol[None, :]
        return out_acc / (mask[k : k + h, k : k + w, None] + _EPS)
    else:
        for ry in range(ov):
            n_ty = -(-(grid_h - ry) // ov)
            row0 = (ry - ov) * stride
            out_r0 = row0 + k
            n_keep_r = min(n_ty * k, h_pad - out_r0)
            for rx in range(ov):
                n_tx = -(-(grid_w - rx) // ov)
                col0 = (rx - ov) * stride
                out_c0 = col0 + k
                n_keep_c = min(n_tx * k, w_pad - out_c0)

                rows = _reflect_index(row0 + np.arange(n_ty * k), h)
                cols = _reflect_index(col0 + np.arange(n_tx * k), w)
                slab = x[jnp.asarray(rows)][:, jnp.asarray(cols)]
                tiles = slab.reshape(n_ty, k, n_tx, k, c)

                raw = jnp.einsum('ruv,aubvc->abcr', ana3, tiles, precision=hp_a)
                mean = raw[..., -1:]
                spec = raw[..., :-1] - mean * a0_j
                a_part = spec[..., :n_rep]
                b_part = spec[..., n_rep:]
                power = a_part * a_part + b_part * b_part + _EPS
                gain = jnp.maximum(power - sig2, 0.0) / power
                spec = jnp.concatenate([a_part * gain, b_part * gain], axis=-1)
                y = jnp.einsum('ruv,abcr->aubvc', syn3, spec, precision=hp_s)
                recon = (
                    y + mean[..., 0][:, None, :, None, :]
                    * mc_j[None, :, None, :, None]
                ).reshape(n_ty * k, n_tx * k, c)
                acc = acc.at[out_r0 : out_r0 + n_keep_r, out_c0 : out_c0 + n_keep_c].add(
                    recon[:n_keep_r, :n_keep_c]
                )

    mask = mrow[:, None] * mcol[None, :]
    return acc[k : k + h, k : k + w] / (mask[k : k + h, k : k + w, None] + _EPS)


def estimate_channel_noise(image, stride: int = 8):
    """Per-channel noise sigma via Laplacian high-pass + MAD/0.6745
    (reference denoise.py:131-158).

    Args:
        image: (H, W, 3) float32.

    Returns:
        (3,) noise sigmas.
    """
    x = jnp.asarray(image, dtype=_F32)
    ch = jnp.moveaxis(x, -1, 0)  # (3, H, W)
    p = jnp.pad(ch, ((0, 0), (1, 1), (1, 1)))
    h, w = x.shape[0], x.shape[1]
    hf = (
        4.0 * p[:, 1 : 1 + h, 1 : 1 + w]
        - p[:, 0:h, 1 : 1 + w]
        - p[:, 2 : 2 + h, 1 : 1 + w]
        - p[:, 1 : 1 + h, 0:w]
        - p[:, 1 : 1 + h, 2 : 2 + w]
    )
    # two 1-D strided slices: a fused 2-D strided slice lowers poorly on TPU
    sub = hf[:, ::stride][:, :, ::stride].reshape(3, -1)
    med = jnp.median(sub, axis=1, keepdims=True)
    mad = jnp.median(jnp.abs(sub - med), axis=1)
    return mad / 0.6745


__all__ = ['estimate_channel_noise', 'wiener_denoise']
