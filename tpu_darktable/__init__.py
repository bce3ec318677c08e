"""tpu_darktable: TPU-native RAW ISP framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
uc-vision/torch-darktable (reference layout: torch_darktable/__init__.py).
Every reference CUDA component is a JAX-callable; the per-frame chain
compiles into one XLA program (see pipeline/), and frame batches shard over
TPU meshes (see parallel/).
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (fused-pipeline / Mosaic compiles
    run minutes on remote-compile hosts; cached reloads take seconds).
    Opt out with TD_NO_COMPILE_CACHE=1; JAX_COMPILATION_CACHE_DIR wins."""
    if _os.environ.get('TD_NO_COMPILE_CACHE') == '1':
        return
    if _os.environ.get('JAX_COMPILATION_CACHE_DIR'):
        return
    try:
        import jax

        if getattr(jax.config, 'jax_compilation_cache_dir', None):
            return  # host app already configured its own cache dir
        cache_dir = _os.path.join(
            _os.path.expanduser('~'), '.cache', 'tpu_darktable', 'jax_cache'
        )
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:
        pass  # never block import on cache plumbing


_enable_compile_cache()

from . import (
    bayer,
    color_conversion,
    debayer,
    denoise,
    extension,
    jpeg,
    local_contrast,
    tonemap,
    white_balance,
)
from .bayer import BayerPattern, PackedFormat, load_as_bayer, rgb_to_bayer
from .color_conversion import (
    color_transform_3x3,
    compute_log_luminance,
    compute_luminance,
    lab_to_rgb,
    lab_to_xyz,
    modify_hsl,
    modify_log_luminance,
    modify_luminance,
    modify_vibrance,
    rgb_to_lab,
    rgb_to_xyz,
    xyz_to_lab,
    xyz_to_rgb,
)
from .debayer import (
    PPG,
    RCD,
    Bilinear5x5,
    PostProcess,
    bilinear5x5_demosaic,
    decode12,
    decode12_float,
    decode12_half,
    decode12_u16,
    encode,
    encode12_float,
    encode12_u16,
)
from .denoise import Wiener, estimate_channel_noise
from .jpeg import InputFormat, Jpeg, JpegException, Subsampling
from .local_contrast import Bilateral, Laplacian, LaplacianParams
from .tonemap import (
    TonemapParameters,
    aces_tonemap,
    compute_image_bounds,
    compute_image_metrics,
    linear_tonemap,
    metrics_from_dict,
    metrics_to_dict,
    print_metrics,
    reinhard_tonemap,
)
from .white_balance import apply_white_balance, estimate_white_balance

__version__ = '0.1.0'

__all__ = [
    'PPG',
    'RCD',
    'BayerPattern',
    'Bilateral',
    'Bilinear5x5',
    'InputFormat',
    'Jpeg',
    'JpegException',
    'Laplacian',
    'LaplacianParams',
    'PackedFormat',
    'PostProcess',
    'Subsampling',
    'TonemapParameters',
    'Wiener',
    'aces_tonemap',
    'apply_white_balance',
    'bayer',
    'bilinear5x5_demosaic',
    'color_conversion',
    'color_transform_3x3',
    'compute_image_bounds',
    'compute_image_metrics',
    'compute_log_luminance',
    'compute_luminance',
    'debayer',
    'decode12',
    'decode12_float',
    'decode12_half',
    'decode12_u16',
    'denoise',
    'encode',
    'encode12_float',
    'encode12_u16',
    'estimate_channel_noise',
    'estimate_white_balance',
    'extension',
    'jpeg',
    'lab_to_rgb',
    'lab_to_xyz',
    'linear_tonemap',
    'load_as_bayer',
    'local_contrast',
    'metrics_from_dict',
    'metrics_to_dict',
    'modify_hsl',
    'modify_log_luminance',
    'modify_luminance',
    'modify_vibrance',
    'print_metrics',
    'reinhard_tonemap',
    'rgb_to_bayer',
    'rgb_to_lab',
    'rgb_to_xyz',
    'tonemap',
    'white_balance',
    'xyz_to_lab',
    'xyz_to_rgb',
]
