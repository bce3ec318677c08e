"""Bilateral grid + local Laplacian behaviour tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops import bilateral, laplacian


def test_bilateral_zero_detail_is_identity(rng):
    lum = rng.random((64, 64)).astype(np.float32)
    out = np.asarray(jax.jit(lambda x: bilateral.bilateral_process(x, 2.0, 0.2, 0.0))(jnp.asarray(lum)))
    np.testing.assert_allclose(out, lum, atol=1e-6)


def test_bilateral_grid_size_matches_reference_formula():
    # 4096x3000, sigma_s=2, sigma_r=0.2
    gx, gy, gz = bilateral.compute_grid_size(4096, 3000, 2.0, 0.2)
    assert (gx, gy, gz) == (2049, 1501, 6)
    # clamped case: tiny sigma on large image hits the 3000-cell cap
    gx, gy, gz = bilateral.compute_grid_size(4096, 3000, 1.0, 0.05)
    assert gx == 3001 and gz == 21


def test_bilateral_enhances_contrast(rng):
    # step edge: detail boost should increase local contrast
    lum = np.full((64, 64), 0.4, dtype=np.float32)
    lum[:, 32:] = 0.6
    out = np.asarray(jax.jit(lambda x: bilateral.bilateral_process(x, 4.0, 0.1, 0.5))(jnp.asarray(lum)))
    assert np.isfinite(out).all()
    assert (out.max() - out.min()) > (0.2 - 1e-3)


def test_laplacian_identity_params(rng):
    # shadows=1, highlights=1, clarity=0 makes the remap curve the identity,
    # so the assembled pyramid reconstructs the input (modulo fp16 storage).
    lum = (rng.random((96, 128)) * 0.8 + 0.1).astype(np.float32)
    params = laplacian.LaplacianParams(sigma=0.2, shadows=1.0, highlights=1.0, clarity=0.0)
    out = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(x, params))(jnp.asarray(lum)))
    np.testing.assert_allclose(out, lum, atol=5e-3)


def test_laplacian_identity_f32_storage(rng):
    lum = (rng.random((64, 64)) * 0.8 + 0.1).astype(np.float32)
    params = laplacian.LaplacianParams()
    out = np.asarray(
        jax.jit(lambda x: laplacian.local_laplacian(x, params, storage_dtype=jnp.float32))(
            jnp.asarray(lum))
    )
    np.testing.assert_allclose(out, lum, atol=1e-5)


def test_laplacian_clarity_changes_output(rng):
    lum = (rng.random((64, 64)) * 0.8 + 0.1).astype(np.float32)
    p0 = laplacian.LaplacianParams(clarity=0.0)
    p1 = laplacian.LaplacianParams(clarity=0.5)
    out0 = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(x, p0))(jnp.asarray(lum)))
    out1 = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(x, p1))(jnp.asarray(lum)))
    assert np.abs(out1 - out0).max() > 1e-3


def test_num_levels():
    assert laplacian.num_levels_for(4096, 3000) == 11
    assert laplacian.num_levels_for(64, 64) == 6


def test_bilateral_fast_path_matches_gather_path(rng):
    # the strided (integer sigma) fast path and the general windowed-gather
    # path must agree to float rounding on identical inputs
    from tpu_darktable.ops import bilateral as B

    lum = rng.random((64, 96)).astype(np.float32)
    for sigma_s in (2.0, 8.0):
        out_fast = np.asarray(jax.jit(lambda x: B.bilateral_process(x, sigma_s, 0.2, 0.4))(jnp.asarray(lum)))
        out_gen = np.asarray(
            jax.jit(lambda x: B.bilateral_process(x, sigma_s, 0.2, 0.4, _force_general=True))(
                jnp.asarray(lum))
        )
        np.testing.assert_allclose(out_fast, out_gen, atol=1e-5)


def test_bilateral_denoise_reduces_noise(rng):
    from tpu_darktable.ops.bilateral import bilateral_denoise

    clean = np.full((64, 64), 0.5, dtype=np.float32)
    noisy = clean + rng.normal(0, 0.03, clean.shape).astype(np.float32)
    out = np.asarray(bilateral_denoise(jnp.asarray(noisy), 4.0, 0.2, 1.0))
    assert np.std(out) < 0.5 * np.std(noisy)
    # amount=0 -> identity
    out0 = np.asarray(bilateral_denoise(jnp.asarray(noisy), 4.0, 0.2, 0.0))
    np.testing.assert_allclose(out0, noisy, atol=1e-6)


def test_splat_operator_tail_equals_dense_matrix(rng):
    """Under grid-axis clamping the windowed splat + tail sum must equal the
    dense CUDA-semantics splat matrix (make_grid_sample, bilateral.cu:71-87):
    g = clamp(p/sigma, 0, n-1), weight (1-frac, frac) into (ib, ib+1) with
    ib = min(floor(g), n-2).  n_cells=101 over 700 pixels at sigma=0.5 puts
    pixels 50.. entirely on the last cell (the tail path)."""
    n_pixels, n_cells, sigma = 700, 101, 0.5
    idx, wgt, tail = bilateral._axis_splat_operator(n_pixels, n_cells, sigma)
    assert 0 < tail < n_pixels

    p = np.arange(n_pixels, dtype=np.float64)
    g = np.clip(p / sigma, 0.0, n_cells - 1)
    ib = np.minimum(g.astype(np.int64), n_cells - 2)
    frac = g - ib
    dense = np.zeros((n_cells, n_pixels), dtype=np.float64)
    dense[ib, p.astype(np.int64)] += 1.0 - frac
    dense[ib + 1, p.astype(np.int64)] += frac

    vals = rng.random(n_pixels).astype(np.float32)
    want = dense @ vals.astype(np.float64)
    got = (wgt.astype(np.float64) * vals[idx]).sum(axis=1)
    got[-1] += vals[tail:].sum(dtype=np.float64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilateral_denoise_clamped_grid(rng):
    """bilateral_denoise shares the tail-handling splat; exercise it under a
    clamped x axis (gx capped at 3001 for sigma_s=0.5 on a 1600-wide plane)
    and check it still behaves as a denoiser with finite output."""
    gx, _, _ = bilateral.compute_grid_size(1600, 8, 0.5, 0.25)
    assert gx == 3001
    clean = np.full((8, 1600), 0.5, dtype=np.float32)
    noisy = clean + rng.normal(0, 0.03, clean.shape).astype(np.float32)
    out = np.asarray(bilateral.bilateral_denoise(jnp.asarray(noisy), 0.5, 0.25, 1.0))
    assert np.isfinite(out).all()
    assert np.std(out) < np.std(noisy)


def test_laplacian_auto_pad_selection():
    """auto_max_supp: neutral params -> token pad (any pad is exact via the
    identity-curve telescoping); non-neutral -> exact reference full pad;
    a positive tolerance admits a bounded smaller pad."""
    neutral = laplacian.LaplacianParams()  # shadows=highlights=1, clarity=0
    assert laplacian.curve_deviation(neutral) == 0.0
    assert laplacian.auto_max_supp(320, 256, neutral) == 32
    # full pad for a small frame is already the token pad
    assert laplacian.auto_max_supp(64, 64, neutral) == 32

    strong = laplacian.LaplacianParams(shadows=0.6, highlights=1.4, clarity=0.3)
    full = 1 << (laplacian.num_levels_for(320, 256) - 1)
    assert laplacian.auto_max_supp(320, 256, strong) == full

    mild = laplacian.LaplacianParams(shadows=0.98)
    assert laplacian.auto_max_supp(320, 256, mild) == full  # exact by default
    assert laplacian.auto_max_supp(320, 256, mild, pad_tolerance=1e-2) < full


def test_laplacian_auto_pad_identity_bitwise(rng):
    """Neutral params: 'auto' (pad 32) is BITWISE equal to the reference
    full pad (128 at this size) with fp16 storage - the identity curve
    makes the assembly telescope to padded[0] at every level, and f32
    arithmetic noise (~2^-23) is rounded away by the fp16 storage."""
    lum = (rng.random((256, 320)) * 0.9 + 0.05).astype(np.float32)
    params = laplacian.LaplacianParams()
    auto = np.asarray(jax.jit(
        lambda x: laplacian.local_laplacian(x, params, max_supp='auto'))(jnp.asarray(lum)))
    full = np.asarray(jax.jit(
        lambda x: laplacian.local_laplacian(x, params, max_supp=None))(jnp.asarray(lum)))
    np.testing.assert_array_equal(auto, full)
    # the telescoped output is the input rounded through fp16 storage
    np.testing.assert_array_equal(auto, lum.astype(np.float16).astype(np.float32))


def test_laplacian_auto_pad_identity_f32_storage(rng):
    """f32 storage keeps the arithmetic noise, so equality is tight-but-not
    -bitwise: bounded by ~n_levels ulp-scale contributions."""
    lum = (rng.random((256, 320)) * 0.9 + 0.05).astype(np.float32)
    params = laplacian.LaplacianParams()
    auto = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(
        x, params, storage_dtype=jnp.float32, max_supp='auto'))(jnp.asarray(lum)))
    full = np.asarray(jax.jit(lambda x: laplacian.local_laplacian(
        x, params, storage_dtype=jnp.float32, max_supp=None))(jnp.asarray(lum)))
    np.testing.assert_allclose(auto, full, atol=1e-5)


def test_laplacian_pad_sweep_marks_exactness_boundary(rng):
    """Param sweep: where 'auto' picks a reduced pad its output must stay
    within the admitted tolerance of the full-pad reference; where params
    demand exactness 'auto' must select the full pad."""
    lum = (rng.random((256, 320)) * 0.9 + 0.05).astype(np.float32)
    full_pad = 1 << (laplacian.num_levels_for(320, 256) - 1)
    tol = 5e-3
    sweep = [
        laplacian.LaplacianParams(),
        laplacian.LaplacianParams(sigma=0.5),
        laplacian.LaplacianParams(shadows=0.95, highlights=1.05),
        laplacian.LaplacianParams(shadows=0.6, highlights=1.4, clarity=0.3),
        laplacian.LaplacianParams(shadows=0.2, highlights=2.0, clarity=1.0),
    ]
    for params in sweep:
        pad = laplacian.auto_max_supp(320, 256, params, pad_tolerance=tol)
        if pad == full_pad:
            # exactness requires the full pad here: dev too large for tol
            # (skip the two jit compiles - both paths are the same program)
            assert laplacian.curve_deviation(params) > 0.0
            continue
        full = np.asarray(jax.jit(lambda x, p=params: laplacian.local_laplacian(
            x, p, max_supp=None))(jnp.asarray(lum)))
        out = np.asarray(jax.jit(lambda x, p=params, s=pad: laplacian.local_laplacian(
            x, p, max_supp=s))(jnp.asarray(lum)))
        assert np.abs(out - full).max() <= tol, (params, pad)
