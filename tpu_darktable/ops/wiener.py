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


def wiener_denoise(
    image,
    noise_sigmas,
    tile_size: int = 32,
    overlap_factor: int = 4,
    fft_scale: float = 0.3,
    interp_scale: float = 0.3,
):
    """Wiener-filter an (H, W, C) image, C in {1, 3}.

    Args:
        image: (H, W, C) float32.
        noise_sigmas: scalar or (C,) per-channel noise sigma.
        tile_size: K in {16, 32}.
        overlap_factor: 2, 4, or 8; tile stride = K / overlap_factor.

    Returns:
        (H, W, C) float32 denoised image.
    """
    x = jnp.asarray(image, dtype=_F32)
    if x.ndim == 2:
        x = x[..., None]
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

    hp = jax.lax.Precision.HIGH
    analysis, synthesis, n_rep = _rdft2_basis(k)
    ana3 = jnp.asarray(analysis.reshape(-1, k, k))
    syn3 = jnp.asarray(synthesis.reshape(-1, k, k))
    sig2 = (sigmas * sigmas)[None, None, :, None]  # (1, 1, C, 1)

    # Reflect-pad once (asymmetric modes matching reflect_index) so every
    # coset slab is a contiguous slice - XLA gathers are slow on TPU.  Small
    # images (reflection wider than the image) fall back to index gathers.
    pad_lo, pad_hi = k, 2 * k
    fast = h > pad_hi and w > pad_hi
    if fast:
        xr = jnp.concatenate([x[1 : pad_lo + 1][::-1], x, x[::-1][:pad_hi]], axis=0)
        xr = jnp.concatenate(
            [xr[:, 1 : pad_lo + 1][:, ::-1], xr, xr[:, ::-1][:, :pad_hi]], axis=1
        )

    for ry in range(ov):
        n_ty = -(-(grid_h - ry) // ov)  # tiles in this row-coset
        # tile g = ry + m*ov covers source rows (g - ov)*stride + [0, K)
        row0 = (ry - ov) * stride
        out_r0 = row0 + k  # output offset in padded coords
        n_keep_r = min(n_ty * k, h_pad - out_r0)
        for rx in range(ov):
            n_tx = -(-(grid_w - rx) // ov)
            col0 = (rx - ov) * stride
            out_c0 = col0 + k
            n_keep_c = min(n_tx * k, w_pad - out_c0)

            if fast:
                slab = xr[
                    pad_lo + row0 : pad_lo + row0 + n_ty * k,
                    pad_lo + col0 : pad_lo + col0 + n_tx * k,
                ]  # (n_ty*K, n_tx*K, C)
            else:
                rows = _reflect_index(row0 + np.arange(n_ty * k), h)
                cols = _reflect_index(col0 + np.arange(n_tx * k), w)
                slab = x[jnp.asarray(rows)][:, jnp.asarray(cols)]
            # (n_ty, K, n_tx, K, C) - no physical transpose; the DFT einsums
            # address the tile axes in place.
            tiles = slab.reshape(n_ty, k, n_tx, k, c)

            mean = jnp.mean(tiles, axis=(1, 3), keepdims=True)
            wf2 = wf_j[None, :, None, None, None] * wf_j[None, None, None, :, None]
            v = (tiles - mean) * wf2

            # 2-D real DFT as ONE fat matmul over the flattened tile (and one
            # back): ~5x the FLOPs of a separable DFT but 1/3 the HBM traffic,
            # the right trade on the MXU.  precision=HIGH keeps bf16 passes
            # within the float32 parity budget.
            if c == 1:
                v1 = v[..., 0]
                spec = jnp.einsum('ruv,aubv->abr', ana3, v1, precision=hp)
                a_part = spec[..., :n_rep]
                b_part = spec[..., n_rep:]
                power = a_part * a_part + b_part * b_part + _EPS
                gain = jnp.maximum(power - sig2[..., 0, :], 0.0) / power
                spec = jnp.concatenate([a_part * gain, b_part * gain], axis=-1)
                y = jnp.einsum('ruv,abr->aubv', syn3, spec, precision=hp)[..., None]
            else:
                spec = jnp.einsum('ruv,aubvc->abcr', ana3, v, precision=hp)
                a_part = spec[..., :n_rep]
                b_part = spec[..., n_rep:]
                power = a_part * a_part + b_part * b_part + _EPS
                gain = jnp.maximum(power - sig2, 0.0) / power
                spec = jnp.concatenate([a_part * gain, b_part * gain], axis=-1)
                y = jnp.einsum('ruv,abcr->aubvc', syn3, spec, precision=hp)

            wi2 = wi_j[None, :, None, None, None] * wi_j[None, None, None, :, None]
            recon = (y + mean * wf2) * wi2
            recon = recon.reshape(n_ty * k, n_tx * k, c)

            acc = acc.at[out_r0 : out_r0 + n_keep_r, out_c0 : out_c0 + n_keep_c].add(
                recon[:n_keep_r, :n_keep_c]
            )

    mask = mrow[:, None] * mcol[None, :]
    out = acc[k : k + h, k : k + w] / (mask[k : k + h, k : k + w, None] + _EPS)
    return out


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
    sub = hf[:, ::stride, ::stride].reshape(3, -1)
    med = jnp.median(sub, axis=1, keepdims=True)
    mad = jnp.median(jnp.abs(sub - med), axis=1)
    return mad / 0.6745


__all__ = ['estimate_channel_noise', 'wiener_denoise']
