"""Sharding: batch DP over the virtual 8-device mesh + spatial row sharding.

The distributed-correctness suite the reference never had (SURVEY.md
section 4): sharded output must equal single-device output exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_darktable as td
from tpu_darktable.ops import packed, rcd, demosaic
from tpu_darktable.parallel import (
    make_mesh,
    shard_batch,
    sharded_pipeline,
    spatial_shard_map_demosaic,
)
from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
from tpu_darktable.pipeline.image_processor import build_pipeline_fn


def _settings(**kw):
    defaults = dict(
        debayer=Debayer.rcd, postprocess=True, enable_denoise=True,
        enable_bilateral=True, tone_mapping=ToneMapper.reinhard,
        tone_intensity=2.5, vibrance=0.5,
    )
    defaults.update(kw)
    return ImageProcessingSettings(**defaults)


def _smooth_mosaic(rng, h, w):
    """Smooth content + mild noise.  Pure uniform-random mosaics make RCD
    overshoot negative at noise edges, parking pixels on the Reinhard pole
    rgb = -adapt where any float-reassociation difference between sharded
    and unsharded programs explodes to a full uint8 flip."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.45 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    return np.clip(base + rng.normal(0, 0.03, (h, w)), 0.0, 0.9).astype(np.float32)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_batch_sharded_pipeline_matches_single_device(rng):
    h, w = 64, 96
    n = 8
    mosaics = (rng.random((n, h, w)) * 0.8).astype(np.float32)
    byte_batch = np.stack([
        np.asarray(packed.encode12_float(jnp.asarray(m.reshape(-1)))) for m in mosaics
    ])

    settings = _settings()
    fn = build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                           td.PackedFormat.Packed12, has_white_balance=True)
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_out, ref_b, ref_m = jax.jit(fn)(jnp.asarray(byte_batch), wb, b0, m0, alpha)

    mesh = make_mesh()
    sharded_fn = sharded_pipeline(fn, mesh)
    sh_bytes = shard_batch(jnp.asarray(byte_batch), mesh)
    out, b, m = sharded_fn(sh_bytes, wb, b0, m0, alpha)

    # cross-shard reductions reassociate the metric sums; the EMA'd metrics
    # feed the tonemap, so isolated pixels may round to the neighboring uint8
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out).astype(int))
    assert diff.max() <= 1, diff.max()
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('algorithm', ['rcd', 'ppg', 'bilinear'])
def test_spatial_sharded_demosaic_matches(rng, algorithm):
    h, w = 256, 96
    mosaic = jnp.asarray((rng.random((h, w)) * 0.8).astype(np.float32))
    mesh = make_mesh()

    # jit the references: eager per-op dispatch is 10-70x slower on CPU
    if algorithm == 'rcd':
        ref = jax.jit(lambda m: rcd.rcd_demosaic(m, td.BayerPattern.RGGB, strict_alias=False))(mosaic)
    elif algorithm == 'ppg':
        ref = jax.jit(lambda m: demosaic.ppg_demosaic(m, td.BayerPattern.RGGB))(mosaic)
    else:
        ref = jax.jit(lambda m: demosaic.bilinear5x5_demosaic(m, td.BayerPattern.RGGB))(mosaic)

    out = spatial_shard_map_demosaic(mosaic, mesh, td.BayerPattern.RGGB, algorithm=algorithm)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_small_frame_falls_back(rng):
    mosaic = jnp.asarray((rng.random((64, 64)) * 0.8).astype(np.float32))
    mesh = make_mesh()
    out = spatial_shard_map_demosaic(mosaic, mesh, td.BayerPattern.RGGB, algorithm='bilinear')
    ref = jax.jit(lambda m: demosaic.bilinear5x5_demosaic(m, td.BayerPattern.RGGB))(mosaic)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_full_pipeline_matches_unsharded(rng):
    """The row-band-sharded FULL pipeline == the unsharded fused program
    (strict_alias off), with collective reassociation allowed +-1 uint8."""
    from tpu_darktable.parallel.spatial_pipeline import build_spatial_pipeline_fn

    h, w = 256, 96
    mosaic = (rng.random((h, w)) * 0.8).astype(np.float32)
    data = jnp.asarray(np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1)))))

    settings = _settings()  # rcd + postprocess + denoise + bilateral + reinhard
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_fn = jax.jit(build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                                       td.PackedFormat.Packed12, True,
                                       rcd_strict_alias=False))
    ref_out, ref_b, ref_m = ref_fn(data[None], wb, b0, m0, alpha)

    mesh = make_mesh()
    sp_fn = jax.jit(build_spatial_pipeline_fn(
        settings, (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12,
        True, mesh, halo=64))
    out, b, m = sp_fn(data, wb, b0, m0, alpha)

    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out[0]).astype(int))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_spatial_laplacian_matches_unsharded(rng):
    """enable_laplacian under row-band sharding: the full-frame all-gather
    path must equal the unsharded program (VERDICT r1: the branch used to be
    silently dropped)."""
    from tpu_darktable.parallel.spatial_pipeline import build_spatial_pipeline_fn

    h, w = 256, 96
    mosaic = _smooth_mosaic(rng, h, w)
    data = jnp.asarray(np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1)))))

    settings = _settings(
        enable_denoise=False, enable_bilateral=False, enable_laplacian=True,
        lap_sigma=0.2, lap_shadows=1.2, lap_highlights=0.8, lap_clarity=0.15,
    )
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_fn = jax.jit(build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                                       td.PackedFormat.Packed12, True,
                                       rcd_strict_alias=False))
    ref_out, ref_b, ref_m = ref_fn(data[None], wb, b0, m0, alpha)

    mesh = make_mesh()
    sp_fn = jax.jit(build_spatial_pipeline_fn(
        settings, (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12,
        True, mesh, halo=64))
    out, b, m = sp_fn(data, wb, b0, m0, alpha)

    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out[0]).astype(int))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


@pytest.mark.parametrize('pattern', ['BGGR', 'GRBG', 'GBRG'])
def test_spatial_pipeline_patterns(rng, pattern):
    """Row-band sharding across the non-RGGB patterns (VERDICT r1: only RGGB
    was exercised).  RCD + postprocess are the pattern-sensitive stages."""
    from tpu_darktable.parallel.spatial_pipeline import build_spatial_pipeline_fn

    bp = td.BayerPattern[pattern]
    h, w = 256, 96
    mosaic = _smooth_mosaic(rng, h, w)
    data = jnp.asarray(np.asarray(packed.encode12_float(jnp.asarray(mosaic.reshape(-1)))))

    settings = _settings(enable_denoise=False, enable_bilateral=False)
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_fn = jax.jit(build_pipeline_fn(settings, (w, h), bp, td.PackedFormat.Packed12,
                                       True, rcd_strict_alias=False))
    ref_out, ref_b, ref_m = ref_fn(data[None], wb, b0, m0, alpha)

    mesh = make_mesh()
    sp_fn = jax.jit(build_spatial_pipeline_fn(
        settings, (w, h), bp, td.PackedFormat.Packed12, True, mesh, halo=64))
    out, b, m = sp_fn(data, wb, b0, m0, alpha)

    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out[0]).astype(int))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_spatial_pipeline_ids_format(rng):
    """Row-band sharding of an IDS-packed frame (byte layout differs from
    standard Packed12; the per-band row slicing must still decode cleanly)."""
    from tpu_darktable.parallel.spatial_pipeline import build_spatial_pipeline_fn

    h, w = 256, 96
    mosaic = _smooth_mosaic(rng, h, w)
    data = jnp.asarray(np.asarray(
        packed.encode12_float(jnp.asarray(mosaic.reshape(-1)), ids_format=True)
    ))

    settings = _settings(enable_denoise=False, enable_bilateral=False,
                         debayer=Debayer.bilinear)
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_fn = jax.jit(build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                                       td.PackedFormat.Packed12_IDS, True))
    ref_out, ref_b, ref_m = ref_fn(data[None], wb, b0, m0, alpha)

    mesh = make_mesh()
    sp_fn = jax.jit(build_spatial_pipeline_fn(
        settings, (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12_IDS,
        True, mesh, halo=64))
    out, b, m = sp_fn(data, wb, b0, m0, alpha)

    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out[0]).astype(int))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_multicamera_rig_batch_sharding(rng):
    """Beetroot-style rig: 12 same-geometry cameras shard over a 4-chip mesh
    (12 % 4 == 0), per-camera orientation applied after the fused program."""
    import tpu_darktable.pipeline as pl
    from tpu_darktable.pipeline.camera_settings import load_camera_settings_from_dir

    cams = load_camera_settings_from_dir()['beetroot']
    assert isinstance(cams.transform, dict) and len(cams.transform) == 12

    h, w = 64, 96
    settings = _settings(enable_denoise=False, enable_bilateral=False,
                         postprocess=False, debayer=Debayer.bilinear)
    fn = build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                           td.PackedFormat.Packed12, True)
    mesh = make_mesh(jax.devices()[:4])
    sharded_fn = sharded_pipeline(fn, mesh)

    mosaics = (rng.random((12, h, w)) * 0.8).astype(np.float32)
    byte_batch = np.stack([
        np.asarray(packed.encode12_float(jnp.asarray(m.reshape(-1)))) for m in mosaics
    ])
    out, b, m = sharded_fn(
        shard_batch(jnp.asarray(byte_batch), mesh),
        jnp.asarray([1.8, 1.0, 2.1]), jnp.zeros(2, jnp.float32),
        jnp.zeros(5, jnp.float32), jnp.float32(1.0),
    )
    assert out.shape == (12, h, w, 3)

    from tpu_darktable.pipeline.transform import transform
    names = [f'cam{i}' for i in range(1, 13)]
    final = {nm: transform(out[i], cams.get_image_transform(nm))
             for i, nm in enumerate(names)}
    assert final['cam1'].shape == (w, h, 3)   # rotate_90
    assert final['cam7'].shape == (w, h, 3)   # rotate_270


def test_sharded_image_processor_multicamera(rng):
    """ImageProcessor(mesh=...): a 12-camera set shards over a 4-device
    submesh (the beetroot rig pattern) and matches the unsharded processor."""
    from tpu_darktable.pipeline import ImageProcessor
    from tpu_darktable.pipeline.transform import ImageTransform

    h, w = 64, 96
    names = [f'cam{i:02d}' for i in range(12)]
    frames = {}
    for name in names:
        m = (rng.random((h, w)) * 0.8).astype(np.float32)
        frames[name] = jnp.asarray(
            np.asarray(packed.encode12_float(jnp.asarray(m.reshape(-1))))
        )

    mesh = make_mesh(jax.devices()[:4])
    kw = dict(
        image_size=(w, h),
        bayer_pattern=td.BayerPattern.RGGB,
        packed_format=td.PackedFormat.Packed12,
        settings=_settings(),
        white_balance=(1.2, 1.0, 1.1),
        transforms={n: ImageTransform.rotate_90 for n in names[:3]}
        | {n: ImageTransform.none for n in names[3:]},
    )
    sharded = ImageProcessor(mesh=mesh, **kw)
    single = ImageProcessor(**kw)

    out_s = sharded.process_image_set(frames)
    out_1 = single.process_image_set(frames)
    assert set(out_s) == set(names)
    for n in names:
        diff = np.abs(np.asarray(out_s[n]).astype(int) - np.asarray(out_1[n]).astype(int))
        assert diff.max() <= 1, (n, diff.max())  # reduction reassociation
    np.testing.assert_allclose(np.asarray(sharded.bounds), np.asarray(single.bounds),
                               rtol=1e-5)

    # divisibility guard
    with pytest.raises(ValueError, match='divisible'):
        sharded.process_batch(jnp.stack([frames['cam00']] * 5))


def _encode_batch(rng, n, h, w):
    mosaics = (rng.random((n, h, w)) * 0.8).astype(np.float32)
    return np.stack([
        np.asarray(packed.encode12_float(jnp.asarray(m.reshape(-1)))) for m in mosaics
    ])


@pytest.mark.parametrize('cam_ways,band_ways,n_frames', [
    (4, 2, 12),  # the beetroot deployment shape: 12-camera rig on 8 chips
    (2, 2, 4),   # 1 frame per camera group: exercises the vmap path
])
def test_grid_pipeline_matches_unsharded(rng, cam_ways, band_ways, n_frames):
    """Camera x band 2-D mesh (VERDICT r3 missing #3): the composed
    batch+spatial sharding must equal the unsharded fused program."""
    from tpu_darktable.parallel import build_grid_pipeline_fn, make_grid_mesh

    h, w = 256, 96  # band 128 >= halo window requirement at 2-way splits
    byte_batch = _encode_batch(rng, n_frames, h, w)

    settings = _settings()
    wb = jnp.asarray([1.2, 1.0, 1.1])
    b0 = jnp.zeros(2, jnp.float32)
    m0 = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)

    ref_fn = jax.jit(build_pipeline_fn(settings, (w, h), td.BayerPattern.RGGB,
                                       td.PackedFormat.Packed12, True,
                                       rcd_strict_alias=False))
    ref_out, ref_b, ref_m = ref_fn(jnp.asarray(byte_batch), wb, b0, m0, alpha)

    mesh = make_grid_mesh(cam_ways, band_ways)
    grid_fn = jax.jit(build_grid_pipeline_fn(
        settings, (w, h), td.BayerPattern.RGGB, td.PackedFormat.Packed12,
        True, mesh, halo=64))
    out, b, m = grid_fn(jnp.asarray(byte_batch), wb, b0, m0, alpha)

    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref_m), rtol=1e-5, atol=1e-6)
    diff = np.abs(np.asarray(out).astype(int) - np.asarray(ref_out).astype(int))
    assert diff.max() <= 1, (diff.max(), (diff > 1).sum())


def test_grid_mesh_shape_guards():
    from tpu_darktable.parallel import make_grid_mesh

    mesh = make_grid_mesh(4, 2)
    assert mesh.shape == {'camera': 4, 'band': 2}
    with pytest.raises(ValueError, match='need 16 devices'):
        make_grid_mesh(4, 4)
