"""The pipeline orchestrator: one fused XLA program per frame batch.

TPU-first redesign of reference pipeline/image_processor.py:31-319.  The
reference launches 25-30 CUDA kernels per frame with two host syncs
(SURVEY.md section 3.1); here the whole chain

    decode12 -> WB -> demosaic -> postprocess -> bounds/EMA -> normalize ->
    Wiener(log-lum) -> bilateral -> metrics/EMA -> tonemap -> uint8

compiles into a single jitted batched program.  The EMA bounds/metrics state
is threaded explicitly through the program (no .item() stalls), and the
batch axis is shardable over a device mesh (see tpu_darktable.parallel) -
the metric reductions become XLA collectives automatically.

The reference's piecewise methods (load_bytes / debayer / process_rgb /
tonemap) are kept for API compatibility and run as individually jitted ops.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import debayer as _debayer_mod
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
from .camera_settings import CameraSettings
from .config import Debayer, ImageProcessingSettings, ToneMapper
from .transform import ImageTransform, transform
from .util import lerp, normalize_image, resize_longest_edge


class ImageSizeMismatchError(Exception):
    """Raised when image size does not match expected dimensions
    (reference image_processor.py:14-27)."""

    def __init__(self, message, image_size, packed_format, padding):
        super().__init__(message)
        self.image_size = image_size
        self.packed_format = packed_format
        self.padding = padding


def build_pipeline_fn(
    settings: ImageProcessingSettings,
    image_size: tuple[int, int],
    bayer_pattern: BayerPattern,
    packed_format: PackedFormat,
    has_white_balance: bool,
    rcd_strict_alias: bool = True,
):
    """Build the fused batched pipeline as a jittable pure function.

    Returns fn(bytes_batch (B, n_bytes) uint8, wb (3,) | unused, bounds (2,),
    metrics (5,), alpha scalar) -> (uint8 (B, H, W, 3), bounds', metrics').
    Camera geometry / settings are compiled in as statics.
    """
    width, height = image_size
    ids = packed_format is PackedFormat.Packed12_IDS

    def _demosaic_one(bayer):
        if settings.debayer == Debayer.bilinear:
            return _demosaic.bilinear5x5_demosaic(bayer, bayer_pattern)
        if settings.debayer == Debayer.rcd:
            return _rcd.rcd_demosaic(bayer, bayer_pattern, strict_alias=rcd_strict_alias)
        if settings.debayer == Debayer.ppg:
            return _demosaic.ppg_demosaic(
                bayer, bayer_pattern, median_threshold=settings.ppg_median_threshold
            )
        raise AssertionError(f'Invalid debayer method: {settings.debayer}')

    def _postprocess_one(rgb):
        return _postprocess.postprocess(
            rgb,
            bayer_pattern,
            color_smoothing_passes=settings.color_smoothing_passes,
            green_eq_local_enabled=False,
            green_eq_global_enabled=True,
            green_eq_threshold=settings.green_eq_threshold,
        )

    # Luminance-bracket dedup: each of the denoise/bilateral/laplacian
    # stages extracts LAB luminance and writes it back, and naively each
    # bracket runs rgb_to_lab twice (compute_* clips its input first, the
    # modify_* needs the unclipped LAB).  rgb_to_lab_with_clipped_l shares
    # the sRGB gamma decode between the two value-exactly; when the stage
    # input is statically known to be clipped (it came out of a preceding
    # modify_*, which ends in clip01) the single unclipped LAB serves both
    # sides outright.  Measured ~1 ms/frame per bracket at 12MP
    # (experiments/lab_dedup_probe.py); equal results bit for bit.
    def _lab_and_lum(rgb, input_clipped: bool):
        if input_clipped:
            lab = _color.rgb_to_lab(rgb)
            return lab, lab[..., 0]
        return _color.rgb_to_lab_with_clipped_l(rgb)

    def _denoise_one(rgb):
        eps = 1e-4
        sdt = jnp.float16 if settings.denoise_f16 else None
        # input is normalize_image output: not clipped
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
        out = _bilateral.bilateral_process(
            lum, settings.bil_sigma_spatial, settings.bil_sigma_luminance, settings.bilateral
        )
        return _color.lab_modify_luminance(lab, out)

    def _laplacian_one(rgb):
        from ..ops import laplacian as _lap

        lab, lum = _lab_and_lum(
            rgb,
            input_clipped=settings.enable_denoise or settings.enable_bilateral,
        )
        params = _lap.LaplacianParams(
            sigma=settings.lap_sigma, shadows=settings.lap_shadows,
            highlights=settings.lap_highlights, clarity=settings.lap_clarity,
        )
        return _color.lab_modify_luminance(lab, _lap.local_laplacian(lum, params))

    def _tonemap_batch(rgb, metrics):
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
        raise AssertionError(f'Invalid tone mapping: {settings.tone_mapping}')

    # Stride-8 sample planes ride OUT of the per-frame loops as second
    # outputs so the bounds/metrics statistics never re-read a full-batch
    # tensor (the stats pass was one of the minimal stage's ~3 HBM passes,
    # BASELINE.md "Minimal-stage floor").  The stacked sample planes have
    # the exact shape and element order the old batch[:, ::8][:, :, ::8]
    # slices produced, so every downstream reduction is bit-identical.
    def _sample_plane(rgb):
        # two sequential 1-D strided slices (a fused 2-D strided slice
        # lowers pathologically on TPU - see ops/tonemap.py)
        return rgb[::8][:, ::8]

    def _front_one(frame_rows, wb_gains):
        # decode row-shaped: wide minor dim keeps the byte unpack on the
        # VPU.  Decode + WB live INSIDE the loop so the full-batch float
        # bayer tensor is never materialized in HBM (one read of the packed
        # bytes replaces a write+read of the 2.7x larger float plane).
        bayer = _packed.decode12_float(frame_rows, ids_format=ids)
        if has_white_balance:
            bayer = _wb.apply_white_balance(bayer, wb_gains, bayer_pattern)
        rgb = _demosaic_one(bayer)
        if settings.postprocess:
            rgb = _postprocess_one(rgb)
        return rgb, _sample_plane(rgb)

    def _back_one(rgb, bounds):
        rgb = normalize_image(rgb, bounds)
        if settings.enable_denoise:
            rgb = _denoise_one(rgb)
        if settings.enable_bilateral:
            rgb = _bilateral_one(rgb)
        if settings.enable_laplacian:
            rgb = _laplacian_one(rgb)
        return rgb, _sample_plane(rgb)

    def fused(bytes_batch, wb_gains, bounds_in, metrics_in, alpha):
        rows = bytes_batch.reshape(-1, height, (width * 3) // 2)

        # Large batches: run the memory-heavy per-frame stages sequentially
        # (lax.map = scan) so live intermediates stay one frame deep - the
        # Wiener stage's coset tensors otherwise scale linearly with B and
        # OOM at B >= 8 on 16 GB HBM.  Throughput is unaffected: a 12MP
        # frame already saturates the chip, so vmap parallelism across
        # frames buys nothing (measured batch 1/2/4 within 10%).
        #
        # The per-frame chain runs as exactly TWO batch loops - decode+WB+
        # demosaic+postprocess, then normalize+denoise+bilateral+laplacian
        # (split only by the batch-global bounds EMA between them): every
        # extra lax.map boundary pays a full-batch carry plus per-frame
        # slice/update fusions (profiled ~1-3 ms/frame across the old
        # 4-5 loop structure).
        # TD_MAP_CHUNK (default 1): frames vmapped per loop iteration.  The
        # chip's effective HBM bandwidth rises with working-set size (50 GB/s
        # at one 12MP plane vs 285 GB/s at 4 - dispatch overhead amortizing,
        # BASELINE.md), so chunking the map trades live memory for bandwidth.
        if rows.shape[0] <= 2:
            batch_map = lambda f, x: jax.vmap(f)(x)
        else:
            chunk = int(os.environ.get('TD_MAP_CHUNK', '1'))
            if chunk > 1:
                batch_map = lambda f, x: jax.lax.map(f, x, batch_size=chunk)
            else:
                batch_map = jax.lax.map
        rgb, samples = batch_map(lambda r: _front_one(r, wb_gains), rows)

        # stride=1: `samples` IS the strided sample set (stacked per-frame
        # planes), so this reduces the same elements in the same order as
        # compute_image_bounds(rgb, stride=8) - bit-identical, minus the
        # full-tensor re-read.
        bounds_new = _tonemap.compute_image_bounds(samples, stride=1)
        bounds = lerp(bounds_in, bounds_new, alpha)

        if (settings.enable_denoise or settings.enable_bilateral
                or settings.enable_laplacian):
            rgb, samples = batch_map(lambda f: _back_one(f, bounds), rgb)
            rgb_out = rgb
        else:
            # Elementwise normalize commutes with the strided sampling:
            # normalizing the pass-1 sample planes gives bit-identical
            # metrics, and the full-tensor normalize fuses into the tonemap
            # consumer instead of materializing between stats and tail.
            samples = normalize_image(samples, bounds)
            rgb_out = normalize_image(rgb, bounds)

        metrics_new = _tonemap.compute_image_metrics(samples, stride=1)
        metrics = lerp(metrics_in, metrics_new, alpha)

        out = _tonemap_batch(rgb_out, metrics)
        return out, bounds, metrics

    return fused


class ImageProcessor:
    """Camera-geometry-bound processor (reference image_processor.py:31-319).

    Construction pre-builds the reference-compatible per-op workspaces and
    the fused batched program; jit shape-specialization replaces CUDA buffer
    pre-allocation.
    """

    def __init__(
        self,
        image_size: tuple[int, int],
        bayer_pattern: BayerPattern,
        packed_format: PackedFormat,
        settings: ImageProcessingSettings,
        device=None,
        white_balance: tuple[float, float, float] | None = None,
        transforms: ImageTransform | dict[str, ImageTransform] = ImageTransform.none,
        padding: int = 0,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'batch' axis - frame
        batches / multi-camera sets then shard across its devices (the
        beetroot 12-camera rig maps cameras across chips this way); the EMA
        statistics reductions lower to psum collectives over ICI.  Batch
        size must be divisible by the mesh size."""
        self.device = device
        self.settings = settings
        self.image_size = tuple(image_size)
        self.bayer_pattern = bayer_pattern
        self.packed_format = packed_format
        self.transforms = transforms
        self.padding = padding
        self.mesh = mesh

        self.metrics = None
        self.bounds = None

        self.white_balance = (
            jnp.asarray(white_balance, dtype=jnp.float32) if white_balance is not None else None
        )

        self._rebuild_workspaces()

    def _rebuild_workspaces(self):
        from .. import (
            Bilateral as _Bilateral,
            PPG as _PPG,
            RCD as _RCD,
            PostProcess as _PostProcess,
            Wiener as _Wiener,
        )

        s = self.settings
        self.bil_workspace = _Bilateral(
            self.device, self.image_size, sigma_s=s.bil_sigma_spatial, sigma_r=s.bil_sigma_luminance
        )
        self.rcd_workspace = _RCD(self.device, self.image_size, self.bayer_pattern)
        self.ppg_workspace = _PPG(
            self.device, self.image_size, self.bayer_pattern, median_threshold=s.ppg_median_threshold
        )
        self.postprocess_workspace = _PostProcess(
            self.device,
            self.image_size,
            self.bayer_pattern,
            color_smoothing_passes=s.color_smoothing_passes,
            green_eq_local=False,
            green_eq_global=True,
            green_eq_threshold=s.green_eq_threshold,
        )
        _sdt = jnp.float16 if s.denoise_f16 else None
        self.wiener_workspace = _Wiener(
            self.device, self.image_size, overlap_factor=s.denoise_overlap,
            spectral_dtype=_sdt, storage_dtype=_sdt,
        )

        fused = build_pipeline_fn(
            self.settings,
            self.image_size,
            self.bayer_pattern,
            self.packed_format,
            self.white_balance is not None,
        )
        if self.mesh is not None:
            from ..parallel.mesh import sharded_pipeline

            self._fused = sharded_pipeline(fused, self.mesh)
        else:
            self._fused = jax.jit(fused)

    def __repr__(self) -> str:
        wb_str = (
            f'({float(self.white_balance[0]):.3f}, {float(self.white_balance[1]):.3f}, '
            f'{float(self.white_balance[2]):.3f})'
            if self.white_balance is not None
            else 'None'
        )
        transform_str = (
            f'{self.transforms.name}'
            if isinstance(self.transforms, ImageTransform)
            else f'{{{", ".join(f"{k}: {v.name}" for k, v in self.transforms.items())}}}'
        )
        return (
            f'ImageProcessor(size={self.image_size}, bayer={self.bayer_pattern.name}, '
            f'format={self.packed_format.name}, device={self.device}, wb={wb_str}, '
            f'padding={self.padding}, transform={transform_str}, '
            f'debayer={self.settings.debayer.name}, tonemap={self.settings.tone_mapping.name})'
        )

    @staticmethod
    def from_camera_settings(camera_settings: CameraSettings, device=None):
        return ImageProcessor(
            camera_settings.image_size,
            camera_settings.bayer_pattern,
            camera_settings.packed_format,
            camera_settings.image_processing,
            device=device,
            white_balance=camera_settings.white_balance,
            transforms=camera_settings.transform,
            padding=camera_settings.padding,
        )

    def update_settings(self, settings: ImageProcessingSettings):
        """Swap settings, rebuilding only what changed (reference :134-160).

        Under jit, a rebuild just swaps the compiled-program cache key; XLA
        caches previous programs, so toggling back is free.
        """
        if settings != self.settings:
            self.settings = settings
            self._rebuild_workspaces()

    @property
    def final_size(self):
        return resize_longest_edge(self.image_size, self.settings.resize_width)

    @property
    def expected_bytes(self) -> int:
        width, height = self.image_size
        pixels = width * height
        match self.packed_format:
            case PackedFormat.Packed12 | PackedFormat.Packed12_IDS:
                raw_bytes = (pixels * 3) // 2
            case _:
                raise ValueError(f'Unsupported packed format: {self.packed_format}')
        return raw_bytes + self.padding

    def _image_size_mismatch_error(self, message: str) -> ImageSizeMismatchError:
        return ImageSizeMismatchError(
            message,
            image_size=self.image_size,
            packed_format=self.packed_format,
            padding=self.padding,
        )

    # ------------------------------------------------------------------
    # Piecewise API (reference :189-281)
    # ------------------------------------------------------------------

    def load_bytes(self, bytes):
        bytes = jnp.asarray(bytes)
        if bytes.size != self.expected_bytes:
            raise self._image_size_mismatch_error(
                f'Image size mismatch: expected {self.expected_bytes} bytes for '
                f'{self.image_size} {self.packed_format.name} with {self.padding} padding, '
                f'got {bytes.size} bytes. '
            )
        if self.padding > 0:
            bytes = bytes[: -self.padding]
        decoded = _packed.decode12(bytes, output_dtype=jnp.float32, format_type=self.packed_format)
        width, height = self.image_size
        if decoded.size != width * height:
            raise self._image_size_mismatch_error(
                f'Decoded image size mismatch: expected {width * height} pixels '
                f'({width}x{height}), got {decoded.size} pixels.'
            )
        return decoded.reshape(height, width)

    def load_image(self, bytes):
        return self.debayer(self.load_bytes(bytes))

    def debayer(self, bayer_image):
        assert bayer_image.ndim == 2, f'Bayer image must have 2 dimensions, got {bayer_image.shape}'

        if self.white_balance is not None:
            bayer_image = _wb.apply_white_balance(
                bayer_image, self.white_balance, self.bayer_pattern
            )

        if self.settings.debayer == Debayer.bilinear:
            rgb_raw = _debayer_mod.bilinear5x5_demosaic(bayer_image[..., None], self.bayer_pattern)
        elif self.settings.debayer == Debayer.rcd:
            rgb_raw = self.rcd_workspace.process(bayer_image[..., None])
        elif self.settings.debayer == Debayer.ppg:
            rgb_raw = self.ppg_workspace.process(bayer_image[..., None])
        else:
            raise AssertionError(f'Invalid debayer method: {self.settings.debayer}')

        if self.settings.postprocess:
            rgb_raw = self.postprocess_workspace.process(rgb_raw)
        return rgb_raw

    def process_rgb(self, rgb_raw, bounds=None):
        if bounds is not None:
            rgb_raw = normalize_image(rgb_raw, bounds)
        if self.settings.enable_denoise:
            rgb_raw = self.wiener_workspace.process_log_luminance(rgb_raw, self.settings.denoise)
        if self.settings.enable_bilateral:
            rgb_raw = self.bil_workspace.process_rgb(rgb_raw, self.settings.bilateral)
        if self.settings.enable_laplacian:
            from ..ops import color as _c, laplacian as _lap

            lum = _c.compute_luminance(rgb_raw)
            params = _lap.LaplacianParams(
                sigma=self.settings.lap_sigma, shadows=self.settings.lap_shadows,
                highlights=self.settings.lap_highlights, clarity=self.settings.lap_clarity,
            )
            rgb_raw = _c.modify_luminance(rgb_raw, _lap.local_laplacian(lum, params))
        return rgb_raw

    def tonemap(self, rgb_raw, metrics=None):
        params = _tonemap.TonemapParameters(
            self.settings.tone_gamma,
            self.settings.tone_intensity,
            self.settings.light_adapt,
            self.settings.vibrance,
        )
        if metrics is None:
            metrics = _tonemap.compute_image_metrics([rgb_raw], stride=4, min_gray=1e-4)

        match self.settings.tone_mapping:
            case ToneMapper.reinhard:
                return _tonemap.reinhard_tonemap(rgb_raw, metrics, params)
            case ToneMapper.linear:
                return _tonemap.linear_tonemap(rgb_raw, metrics, params)
            case ToneMapper.aces:
                return _tonemap.aces_tonemap(rgb_raw, params)
            case ToneMapper.adaptive_aces:
                return _tonemap.aces_tonemap(rgb_raw, params, metrics)
            case ToneMapper.filmic:
                return _tonemap.filmic_tonemap(rgb_raw, params, metrics)

    def transform(self, image, image_name: str):
        if isinstance(self.transforms, dict):
            return transform(image, self.transforms[image_name])
        return transform(image, self.transforms)

    # ------------------------------------------------------------------
    # Fused batch API (THE hot path)
    # ------------------------------------------------------------------

    def process_batch(self, bytes_batch):
        """Run the fused pipeline on a (B, n_bytes) uint8 batch, updating the
        EMA state.  Returns (B, H, W, 3) uint8 (pre-orientation)."""
        bytes_batch = jnp.asarray(bytes_batch)
        if bytes_batch.ndim == 1:
            bytes_batch = bytes_batch[None]
        if bytes_batch.shape[-1] != self.expected_bytes:
            raise self._image_size_mismatch_error(
                f'Image size mismatch: expected {self.expected_bytes} bytes, '
                f'got {bytes_batch.shape[-1]} bytes.'
            )
        if self.padding > 0:
            bytes_batch = bytes_batch[:, : -self.padding]
        if self.mesh is not None and bytes_batch.shape[0] % self.mesh.size != 0:
            raise ValueError(
                f'batch size {bytes_batch.shape[0]} must be divisible by the '
                f'mesh size {self.mesh.size} for sharded processing'
            )

        first = self.bounds is None
        alpha = jnp.float32(1.0 if first else self.settings.moving_average)
        bounds_in = jnp.zeros(2, jnp.float32) if first else self.bounds
        metrics_in = jnp.zeros(5, jnp.float32) if first else self.metrics
        wb = (
            self.white_balance
            if self.white_balance is not None
            else jnp.ones(3, jnp.float32)
        )

        out, self.bounds, self.metrics = self._fused(bytes_batch, wb, bounds_in, metrics_in, alpha)
        return out

    def process_image_set(self, image_set_bytes: dict):
        """Process a named set of same-geometry frames through ONE fused
        program (reference :284-300 runs per-image kernel chains)."""
        image_names = list(image_set_bytes.keys())
        batch = jnp.stack([jnp.asarray(b) for b in image_set_bytes.values()])
        if batch.shape[-1] != self.expected_bytes:
            raise self._image_size_mismatch_error(
                f'Image size mismatch: expected {self.expected_bytes} bytes, '
                f'got {batch.shape[-1]} bytes.'
            )

        out = self.process_batch(batch)
        return {
            name: self.transform(out[i], name) for i, name in enumerate(image_names)
        }

    def process(self, bytes, image_name: str):
        return self.process_image_set({image_name: bytes})[image_name]
