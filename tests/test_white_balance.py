"""White balance: gain application per CFA site + estimation sanity."""

import numpy as np
import jax.numpy as jnp

from tpu_darktable.ops import bayer
from tpu_darktable.ops import white_balance as wb


def test_apply_gains_per_site(rng):
    x = (rng.random((8, 8)) * 0.4).astype(np.float32)
    gains = np.array([2.0, 1.0, 1.5], dtype=np.float32)
    p = bayer.BayerPattern.RGGB
    out = np.asarray(wb.apply_white_balance(jnp.asarray(x), jnp.asarray(gains), p))
    codes = bayer.fc_map(8, 8, p)
    gain_map = np.where(codes == 0, 2.0, np.where(codes == 2, 1.5, 1.0))
    np.testing.assert_allclose(out, np.clip(x * gain_map, 0, 1), atol=1e-6)


def test_apply_clamps_to_unit():
    x = jnp.full((4, 4), 0.9, dtype=jnp.float32)
    out = wb.apply_white_balance(x, jnp.asarray([2.0, 2.0, 2.0]), bayer.BayerPattern.RGGB)
    assert float(jnp.max(out)) <= 1.0


def test_estimate_matches_reference_semantics(rng):
    # The reference returns chroma ratios r/g and b/g of the bright samples
    # (white_balance.cu:150-161), NOT inverse gains - for a scene with
    # r = 0.5*g, b = g/2.1 the result is (0.5, 1, 1/2.1).  Bug-compatible.
    h, w = 128, 128
    base = (rng.random((h, w)) * 0.3 + 0.4).astype(np.float32)
    rgb = np.stack([base * 0.5, base, base / 2.1], axis=-1)
    mosaic = np.asarray(bayer.rgb_to_bayer(jnp.asarray(rgb), bayer.BayerPattern.RGGB))[..., 0]
    gains = np.asarray(
        wb.estimate_white_balance([jnp.asarray(mosaic)], bayer.BayerPattern.RGGB, stride=8)
    )
    assert gains[1] == 1.0
    assert 0.45 < gains[0] < 0.55  # ~0.5
    assert 0.42 < gains[2] < 0.53  # ~1/2.1


def test_estimate_all_saturated_returns_unit():
    mosaic = jnp.ones((64, 64), dtype=jnp.float32) * 1.5
    gains = np.asarray(
        wb.estimate_white_balance([mosaic], bayer.BayerPattern.RGGB, stride=8)
    )
    np.testing.assert_allclose(gains, [1.0, 1.0, 1.0])
