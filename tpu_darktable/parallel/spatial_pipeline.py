"""Spatially-sharded FULL pipeline: row bands across the mesh, optionally
composed with camera/batch sharding on a 2-D mesh.

Single-frame latency scaling (the SP analog of SURVEY.md section 2.21 for
the whole chain, not just the demosaic): every local stage - decode, WB,
demosaic, color smoothing, Wiener, bilateral, tonemap - has an influence
radius bounded by ~64 px (RCD border ladder 32, Wiener K+stride, bilateral
~3*sigma_s cells), so each chip computes its band on a clamped halo window
of the frame (see spatial.py).  The three *global* quantities become ICI
collectives:

- image bounds: psum-min/max of per-band strided extrema,
- image metrics: psum of per-band masked sums + valid counts,
- green-equilibration ratio: psum of per-band G1/G2 sums.

The local-Laplacian stage is the one whose influence radius exceeds any
halo (max_supp spans the frame): it all-gathers the core-band luminance
into the full frame and computes the identical full-frame pyramid on each
shard (exact, redundant compute — see _laplacian_sharded).

2-D composition (``build_grid_pipeline_fn``): the v5e-8 deployment shape
for a multi-camera rig at low latency shards cameras x row-bands on a
``(camera, band)`` mesh — e.g. the 12-camera beetroot rig as 4-way camera
x 2-way spatial on 8 chips.  Green-eq/laplacian collectives stay per-frame
(band axis only); the bounds/metrics EMA statistics are batch-global in
the fused program (image_processor.py) and therefore reduce over BOTH mesh
axes here.

Alignment requirements (asserted): band and halo multiples of 8 (stride-8
statistics sampling and CFA phase), halo >= 64, and integer bilateral
sigma_s dividing the window offsets so grid cells align globally.

Exactness: matches the unsharded fused program (RCD strict_alias=False)
to float rounding; collective reassociation can move isolated uint8 outputs
by one count.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bilateral as _bilateral
from ..ops import color as _color
from ..ops import demosaic as _demosaic
from ..ops import packed as _packed
from ..ops import postprocess as _postprocess
from ..ops import rcd as _rcd
from ..ops import tonemap as _tonemap
from ..ops import white_balance as _wb
from ..ops import wiener as _wiener
from ..ops.bayer import BayerPattern, PackedFormat
from ..ops._stencil import site_masks, row_col_iota
from ..pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
from ..pipeline.util import lerp, normalize_image

DEFAULT_HALO = 64


def _build_banded_pipeline_fn(
    settings: ImageProcessingSettings,
    image_size: tuple[int, int],
    bayer_pattern: BayerPattern,
    packed_format: PackedFormat,
    has_white_balance: bool,
    mesh: Mesh,
    band_axis: str,
    camera_axis: str | None,
    halo: int,
):
    width, height = image_size
    n = mesh.shape[band_axis]
    ids = packed_format is PackedFormat.Packed12_IDS
    # Bounds/metrics are batch-global in the fused program: reduce over the
    # whole mesh.  Green-eq and the laplacian gather are per-frame: band only.
    stat_axes = (band_axis,) if camera_axis is None else (camera_axis, band_axis)

    if height % n:
        raise ValueError(f'height {height} not divisible by {n} shards')
    band = height // n
    if band % 8 or halo % 8:
        raise ValueError('band and halo must be multiples of 8 (stats alignment)')
    block = band + 2 * halo
    if block > height:
        raise ValueError(f'frame too small to shard {n} ways with halo {halo}')
    if settings.enable_bilateral:
        s_int = int(settings.bil_sigma_spatial)
        if float(settings.bil_sigma_spatial) != s_int or halo % s_int or band % s_int:
            raise ValueError('bilateral sigma_s must be an integer dividing band and halo')

    row_bytes = (width * 3) // 2

    def _demosaic_one(bayer):
        if settings.debayer == Debayer.bilinear:
            return _demosaic.bilinear5x5_demosaic(bayer, bayer_pattern)
        if settings.debayer == Debayer.rcd:
            return _rcd.rcd_demosaic(bayer, bayer_pattern, strict_alias=False,
                                     use_pallas=False)
        if settings.debayer == Debayer.ppg:
            return _demosaic.ppg_demosaic(
                bayer, bayer_pattern, median_threshold=settings.ppg_median_threshold
            )
        raise AssertionError(f'Invalid debayer method: {settings.debayer}')

    def _green_eq_global_sharded(rgb, core):
        """Green equilibration with G1/G2 sums psum'd over the band axis
        (postprocess.cu:175-255).  `core` masks this shard's own rows."""
        h_blk, w_blk = rgb.shape[:2]
        g = rgb[..., 1]
        masks = site_masks(h_blk, w_blk, bayer_pattern)
        rows, cols = row_col_iota(h_blk, w_blk)
        # isinimage uses even-cropped FULL image dims; width even in practice,
        # rows within a core band are always < 2*(H//2) when H is even.
        g1 = masks['g'] & ((rows & 1) == 0) & core
        g2 = masks['g'] & ((rows & 1) == 1) & core
        sum1 = jax.lax.psum(jnp.sum(jnp.where(g1, g, 0.0)), band_axis)
        sum2 = jax.lax.psum(jnp.sum(jnp.where(g2, g, 0.0)), band_axis)
        ratio = jnp.where((sum1 > 0.0) & (sum2 > 0.0), sum2 / jnp.maximum(sum1, 1e-30), 1.0)
        is_g1 = masks['g'] & ((rows & 1) == 0)
        new_g = jnp.where(is_g1, g * ratio, g)
        return jnp.maximum(jnp.stack((rgb[..., 0], new_g, rgb[..., 2]), axis=-1), 0.0)

    def _postprocess_block(rgb, core):
        for _ in range(settings.color_smoothing_passes):
            rgb = _postprocess.color_smoothing_pass(rgb)
        return _green_eq_global_sharded(rgb, core)

    # Luminance-bracket LAB dedup, mirroring the fused single-device builder
    # (pipeline/image_processor.py): value-exact, so the sharded-vs-unsharded
    # equality tests are unaffected.
    def _lab_and_lum(rgb, input_clipped: bool):
        if input_clipped:
            lab = _color.rgb_to_lab(rgb)
            return lab, lab[..., 0]
        return _color.rgb_to_lab_with_clipped_l(rgb)

    def _denoise_one(rgb):
        eps = 1e-4
        sdt = jnp.float16 if settings.denoise_f16 else None
        lab, lum = _color.rgb_to_lab_with_clipped_l(rgb)
        log_lum = jnp.log(jnp.maximum(eps, lum))
        den = _wiener.wiener_denoise(
            log_lum[..., None], jnp.float32(settings.denoise), tile_size=32,
            overlap_factor=settings.denoise_overlap,
            spectral_dtype=sdt, storage_dtype=sdt,
        )[..., 0]
        return _color.lab_modify_luminance(lab, jnp.exp(den + eps))

    def _bilateral_one(rgb):
        lab, lum = _lab_and_lum(rgb, input_clipped=settings.enable_denoise)
        # XLA path under shard_map (like the grid blur above): the Pallas
        # band kernel is single-device tuned and untestable per-shard here.
        out = _bilateral.bilateral_process(
            lum, settings.bil_sigma_spatial, settings.bil_sigma_luminance,
            settings.bilateral, _use_band_kernel=False,
        )
        return _color.lab_modify_luminance(lab, out)

    def _laplacian_sharded(rgb, off, win):
        """Local-Laplacian local contrast under row-band sharding.

        The pyramid's influence radius (max_supp = 1 << (num_levels - 1),
        laplacian.cu:415-418) spans the whole frame — no band halo covers it,
        and num_levels itself depends on the full (W, H).  Exactness therefore
        requires the full-frame pyramid: all-gather the core-band luminances
        into the full frame on every shard, run the identical full-frame
        laplacian (bit-equal to the unsharded program), and slice back this
        shard's block.  Redundant compute across shards, but exact; the
        laplacian is not in the default chain.
        """
        from ..ops import laplacian as _lap

        lab, lum = _lab_and_lum(
            rgb,
            input_clipped=settings.enable_denoise or settings.enable_bilateral,
        )
        lum_core = jax.lax.dynamic_slice(lum, (off, jnp.int32(0)), (band, width))
        lum_full = jax.lax.all_gather(lum_core, band_axis, axis=0, tiled=True)
        params = _lap.LaplacianParams(
            sigma=settings.lap_sigma, shadows=settings.lap_shadows,
            highlights=settings.lap_highlights, clarity=settings.lap_clarity,
        )
        lap_full = _lap.local_laplacian(lum_full, params)
        lap_blk = jax.lax.dynamic_slice(lap_full, (win, jnp.int32(0)), (block, width))
        return _color.lab_modify_luminance(lab, lap_blk)

    def _tonemap_block(rgb, metrics):
        params = _tonemap.TonemapParameters(
            settings.tone_gamma, settings.tone_intensity, settings.light_adapt, settings.vibrance
        )
        match settings.tone_mapping:
            case ToneMapper.reinhard:
                return _tonemap.reinhard_tonemap(rgb, metrics, params)
            case ToneMapper.linear:
                return _tonemap.linear_tonemap(rgb, metrics, params)
            case ToneMapper.aces:
                return _tonemap.aces_tonemap(rgb, params)
            case ToneMapper.adaptive_aces:
                return _tonemap.aces_tonemap(rgb, params, metrics)
            case ToneMapper.filmic:
                return _tonemap.filmic_tonemap(rgb, params, metrics)

    def _band_geometry():
        """(win, off, core_rows (block,1) bool) for this shard's band."""
        i = jax.lax.axis_index(band_axis)
        start = i * band
        win = jnp.clip(start - halo, 0, height - block)
        off = start - win  # core offset within the block
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        core_rows = (r_iota >= off) & (r_iota < off + band)
        return win, off, core_rows

    def _front_block(frame_bytes, wb_gains, win, core_rows):
        """decode12 -> WB -> demosaic -> postprocess on this shard's block."""
        rows = frame_bytes.reshape(height, row_bytes)
        blk_bytes = jax.lax.dynamic_slice(rows, (win, jnp.int32(0)), (block, row_bytes))
        bayer = _packed.decode12_float(blk_bytes, ids_format=ids)
        if has_white_balance:
            bayer = _wb.apply_white_balance(bayer, wb_gains, bayer_pattern)
        rgb = _demosaic_one(bayer)
        if settings.postprocess:
            core = jnp.broadcast_to(core_rows, (block, width))
            rgb = _postprocess_block(rgb, core)
        return rgb

    def _bounds_extrema(rgb, core_s):
        """This shard's strided-sample extrema (stats sampling aligns with
        the full frame because win, band, halo are multiples of 8)."""
        sampled = rgb[::8, ::8, :]
        smin = jnp.min(jnp.where(core_s[..., None], sampled, jnp.inf))
        smax = jnp.max(jnp.where(core_s[..., None], sampled, -jnp.inf))
        return smin, smax

    def _back_block(rgb, bounds, off, win):
        rgb = normalize_image(rgb, bounds)
        if settings.enable_denoise:
            rgb = _denoise_one(rgb)
        if settings.enable_bilateral:
            rgb = _bilateral_one(rgb)
        if settings.enable_laplacian:
            rgb = _laplacian_sharded(rgb, off, win)
        return rgb

    def _metrics_sums(rgb, core_s):
        """Masked metric sums + valid count (color_adaption.cu semantics)."""
        sampled = rgb[::8, ::8, :].astype(jnp.float32)
        cmask = core_s.astype(jnp.float32)  # (bs, 1), broadcasts over cols
        saturated = jnp.any(sampled >= 0.99, axis=-1)
        m = jnp.where(saturated, 0.0, 1.0) * cmask
        gray = _color.rgb_to_gray(sampled)
        log_gray = jnp.log(jnp.maximum(gray, 1e-4))
        sums = jnp.stack((
            jnp.sum(log_gray * m),
            jnp.sum(gray * m),
            jnp.sum(sampled[..., 0] * m),
            jnp.sum(sampled[..., 1] * m),
            jnp.sum(sampled[..., 2] * m),
        ))
        return sums, jnp.sum(m)

    def shard_fn(frame_bytes, wb_gains, bounds_in, metrics_in, alpha):
        """Single-frame band shard (1-D mesh)."""
        win, off, core_rows = _band_geometry()
        core_s = core_rows[::8, :]

        rgb = _front_block(frame_bytes, wb_gains, win, core_rows)

        smin, smax = _bounds_extrema(rgb, core_s)
        bounds_new = jnp.stack(
            (jax.lax.pmin(smin, stat_axes), jax.lax.pmax(smax, stat_axes))
        )
        bounds = lerp(bounds_in, bounds_new, alpha)

        rgb = _back_block(rgb, bounds, off, win)

        sums, valid = _metrics_sums(rgb, core_s)
        sums = jax.lax.psum(sums, stat_axes)
        valid = jnp.maximum(jax.lax.psum(valid, stat_axes), 1.0)
        metrics = lerp(metrics_in, (sums / valid).astype(jnp.float32), alpha)

        out = _tonemap_block(rgb, metrics)
        out_band = jax.lax.dynamic_slice(out, (off, jnp.int32(0), jnp.int32(0)), (band, width, 3))
        return out_band, bounds, metrics

    def shard_fn_grid(bytes_local, wb_gains, bounds_in, metrics_in, alpha):
        """Per-shard body on the 2-D mesh: a local batch of frames, each
        processed on this shard's row band.  Mirrors the fused program's
        two-loop structure (front loop -> batch-global bounds -> back loop,
        image_processor.py) with the loops over the LOCAL frames and the
        global reductions over both mesh axes."""
        win, off, core_rows = _band_geometry()
        core_s = core_rows[::8, :]
        b_local = bytes_local.shape[0]
        # lax.map (scan) keeps live intermediates one frame deep, exactly as
        # the fused builder does for batches > 2; collectives inside the map
        # body run in lockstep because every shard has the same trip count.
        if b_local <= 2:
            batch_map = lambda f, x: jax.vmap(f)(x)
        else:
            batch_map = jax.lax.map

        rgb = batch_map(lambda fb: _front_block(fb, wb_gains, win, core_rows),
                        bytes_local)

        smin, smax = jax.vmap(lambda f: _bounds_extrema(f, core_s))(rgb)
        bounds_new = jnp.stack((
            jax.lax.pmin(jnp.min(smin), stat_axes),
            jax.lax.pmax(jnp.max(smax), stat_axes),
        ))
        bounds = lerp(bounds_in, bounds_new, alpha)

        if (settings.enable_denoise or settings.enable_bilateral
                or settings.enable_laplacian):
            rgb = batch_map(lambda f: _back_block(f, bounds, off, win), rgb)
        else:
            rgb = normalize_image(rgb, bounds)

        sums, valid = jax.vmap(lambda f: _metrics_sums(f, core_s))(rgb)
        sums = jax.lax.psum(jnp.sum(sums, axis=0), stat_axes)
        valid = jnp.maximum(jax.lax.psum(jnp.sum(valid), stat_axes), 1.0)
        metrics = lerp(metrics_in, (sums / valid).astype(jnp.float32), alpha)

        out = _tonemap_block(rgb, metrics)
        out_band = jax.lax.dynamic_slice(
            out, (jnp.int32(0), off, jnp.int32(0), jnp.int32(0)),
            (b_local, band, width, 3))
        return out_band, bounds, metrics

    # check_vma=False: the Pallas kernels inside (grid_blur, color_smooth)
    # declare their out_shape via ShapeDtypeStruct without a vma annotation,
    # which jax's varying-mesh-axes checker rejects under shard_map.
    if camera_axis is None:
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(band_axis), P(), P()),
            check_vma=False,
        )
    return shard_map(
        shard_fn_grid,
        mesh=mesh,
        in_specs=(P(camera_axis), P(), P(), P(), P()),
        out_specs=(P(camera_axis, band_axis), P(), P()),
        check_vma=False,
    )


def build_spatial_pipeline_fn(
    settings: ImageProcessingSettings,
    image_size: tuple[int, int],
    bayer_pattern: BayerPattern,
    packed_format: PackedFormat,
    has_white_balance: bool,
    mesh: Mesh,
    axis_name: str = 'batch',
    halo: int = DEFAULT_HALO,
):
    """Single-frame row-band sharding over a 1-D mesh.

    Returns fn(frame_bytes (n_bytes,), wb (3,), bounds (2,), metrics (5,),
    alpha) -> (uint8 (H, W, 3) band-sharded, bounds', metrics')."""
    return _build_banded_pipeline_fn(
        settings, image_size, bayer_pattern, packed_format, has_white_balance,
        mesh, band_axis=axis_name, camera_axis=None, halo=halo,
    )


def build_grid_pipeline_fn(
    settings: ImageProcessingSettings,
    image_size: tuple[int, int],
    bayer_pattern: BayerPattern,
    packed_format: PackedFormat,
    has_white_balance: bool,
    mesh: Mesh,
    camera_axis: str = 'camera',
    band_axis: str = 'band',
    halo: int = DEFAULT_HALO,
):
    """Camera x row-band sharding over a 2-D mesh (SURVEY section 2.21 b+c
    composed): frames shard over ``camera_axis``, each frame's rows over
    ``band_axis`` — e.g. a 12-camera rig on v5e-8 as a (4, 2) mesh, three
    frames per camera group at half-frame latency.

    Returns fn(bytes_batch (B, n_bytes), wb (3,), bounds (2,), metrics (5,),
    alpha) -> (uint8 (B, H, W, 3) sharded (camera, band), bounds', metrics').
    B must divide evenly over the camera axis.
    """
    return _build_banded_pipeline_fn(
        settings, image_size, bayer_pattern, packed_format, has_white_balance,
        mesh, band_axis=band_axis, camera_axis=camera_axis, halo=halo,
    )


__all__ = ['DEFAULT_HALO', 'build_spatial_pipeline_fn', 'build_grid_pipeline_fn']
