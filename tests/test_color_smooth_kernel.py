"""Fused color-smoothing kernel == the per-pass XLA path (interpret mode).

The Pallas cascade (kernels/color_smooth.py) must be BIT-identical to
n x color_smoothing_pass - same zero-fill boundary reads, same clamp
ordering (postprocess.cu:24-78)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_darktable.ops import postprocess as pp


@pytest.mark.parametrize('n_passes', [1, 3, 5])
def test_fused_matches_per_pass(rng, n_passes):
    rgb = jnp.asarray(rng.random((70, 100, 3)).astype(np.float32) - 0.1)
    a = np.asarray(pp.color_smoothing(rgb, n_passes, use_pallas=False))
    b = np.asarray(
        pp.color_smoothing(rgb, n_passes, use_pallas=True, _pallas_interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_fused_small_image_and_band_alignment(rng):
    """Sizes around the band height (bh=32): h < bh, h == bh, h % bh != 0."""
    for h, w in [(20, 40), (32, 64), (50, 96)]:
        rgb = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
        a = np.asarray(pp.color_smoothing(rgb, 3, use_pallas=False))
        b = np.asarray(
            pp.color_smoothing(rgb, 3, use_pallas=True, _pallas_interpret=True)
        )
        np.testing.assert_array_equal(a, b)


def test_zero_passes_identity(rng):
    rgb = jnp.asarray(rng.random((16, 24, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pp.color_smoothing(rgb, 0)), np.asarray(rgb))


def test_grid_blur_kernel_matches_blur5(rng):
    """kernels/grid_blur.py == the three per-axis _blur5 passes."""
    import jax.numpy as jnp
    from tpu_darktable.kernels.grid_blur import grid_blur_xyz
    from tpu_darktable.ops.bilateral import _blur5

    wg = (1 / 16., 4 / 16., 6 / 16., 4 / 16., 1 / 16.)
    wd = (-2 / 16., -4 / 16., 0.0, 4 / 16., 2 / 16.)
    for shape in [(6, 151, 205), (9, 30, 40)]:
        g = jnp.asarray(rng.random(shape).astype(np.float32))
        ref = _blur5(_blur5(_blur5(g, 2, wg), 1, wg), 0, wd)
        out = grid_blur_xyz(g, bh=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        refg = _blur5(_blur5(_blur5(g, 2, wg), 1, wg), 0, wg)
        outg = grid_blur_xyz(g, bh=32, z_mode='gaussian', interpret=True)
        np.testing.assert_allclose(np.asarray(outg), np.asarray(refg), atol=1e-6)


def test_bilateral_fused_blur_paths(rng):
    """bilateral_process with/without the fused blur agree (both sigma paths)."""
    from tpu_darktable.ops import bilateral as bil

    lum = rng.random((96, 128)).astype(np.float32)
    for ss, sr in [(2.0, 0.2), (3.7, 0.13)]:
        a = np.asarray(bil.bilateral_process(lum, ss, sr, 0.4, _use_pallas_blur=False))
        b = np.asarray(bil.bilateral_process(lum, ss, sr, 0.4,
                                             _use_pallas_blur=True, _pallas_interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-6)
