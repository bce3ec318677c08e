"""Spatially-sharded FULL pipeline: one frame, row bands across the mesh.

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
    """Returns fn(frame_bytes (n_bytes,), wb (3,), bounds (2,), metrics (5,),
    alpha) -> (uint8 (H, W, 3) band-sharded, bounds', metrics')."""
    width, height = image_size
    n = mesh.shape[axis_name]
    ids = packed_format is PackedFormat.Packed12_IDS

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
        """Green equilibration with globally-psum'd G1/G2 sums
        (postprocess.cu:175-255).  `core` masks this shard's own rows."""
        h_blk, w_blk = rgb.shape[:2]
        g = rgb[..., 1]
        masks = site_masks(h_blk, w_blk, bayer_pattern)
        rows, cols = row_col_iota(h_blk, w_blk)
        # isinimage uses even-cropped FULL image dims; width even in practice,
        # rows within a core band are always < 2*(H//2) when H is even.
        g1 = masks['g'] & ((rows & 1) == 0) & core
        g2 = masks['g'] & ((rows & 1) == 1) & core
        sum1 = jax.lax.psum(jnp.sum(jnp.where(g1, g, 0.0)), axis_name)
        sum2 = jax.lax.psum(jnp.sum(jnp.where(g2, g, 0.0)), axis_name)
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
        lum_full = jax.lax.all_gather(lum_core, axis_name, axis=0, tiled=True)
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

    def shard_fn(frame_bytes, wb_gains, bounds_in, metrics_in, alpha):
        i = jax.lax.axis_index(axis_name)
        start = i * band
        win = jnp.clip(start - halo, 0, height - block)
        off = start - win  # core offset within the block

        rows = frame_bytes.reshape(height, row_bytes)
        blk_bytes = jax.lax.dynamic_slice(rows, (win, jnp.int32(0)), (block, row_bytes))
        bayer = _packed.decode12_float(blk_bytes, ids_format=ids)

        if has_white_balance:
            bayer = _wb.apply_white_balance(bayer, wb_gains, bayer_pattern)

        rgb = _demosaic_one(bayer)

        # core mask: this shard's own rows within the block.  Strided stats
        # sampling aligns because win, band, halo are multiples of 8.
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        core_rows = (r_iota >= off) & (r_iota < off + band)
        core = jnp.broadcast_to(core_rows, (block, width))

        if settings.postprocess:
            rgb = _postprocess_block(rgb, core)

        # global bounds via psum-min/max of strided core samples
        sampled = rgb[::8, ::8, :]
        core_s = core_rows[::8, :]
        smin = jnp.min(jnp.where(core_s[..., None], sampled, jnp.inf))
        smax = jnp.max(jnp.where(core_s[..., None], sampled, -jnp.inf))
        bounds_new = jnp.stack(
            (jax.lax.pmin(smin, axis_name), jax.lax.pmax(smax, axis_name))
        )
        bounds = lerp(bounds_in, bounds_new, alpha)
        rgb = normalize_image(rgb, bounds)

        if settings.enable_denoise:
            rgb = _denoise_one(rgb)
        if settings.enable_bilateral:
            rgb = _bilateral_one(rgb)
        if settings.enable_laplacian:
            rgb = _laplacian_sharded(rgb, off, win)

        # global metrics via psum'd masked sums (color_adaption.cu semantics)
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
        sums = jax.lax.psum(sums, axis_name)
        valid = jnp.maximum(jax.lax.psum(jnp.sum(m), axis_name), 1.0)
        metrics_new = (sums / valid).astype(jnp.float32)
        metrics = lerp(metrics_in, metrics_new, alpha)

        out = _tonemap_block(rgb, metrics)
        out_band = jax.lax.dynamic_slice(out, (off, jnp.int32(0), jnp.int32(0)), (band, width, 3))
        return out_band, bounds, metrics

    # check_vma=False: the Pallas kernels inside (grid_blur, color_smooth)
    # declare their out_shape via ShapeDtypeStruct without a vma annotation,
    # which jax's varying-mesh-axes checker rejects under shard_map.
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis_name), P(), P()),
        check_vma=False,
    )
    return fn


__all__ = ['DEFAULT_HALO', 'build_spatial_pipeline_fn']
