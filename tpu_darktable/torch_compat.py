"""Torch interop: call tpu_darktable with torch tensors.

Migration aid for users of the reference (a torch CUDA extension): wraps the
public API so torch.Tensor inputs are accepted and torch.Tensor outputs
returned, converting through dlpack/numpy at the boundary.  Compute still
runs on the TPU via JAX; this is an adapter, not a torch backend.

    import tpu_darktable.torch_compat as td   # drop-in-ish
    rgb = td.bilinear5x5_demosaic(bayer_torch, td.BayerPattern.RGGB)
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

import tpu_darktable as _td
from tpu_darktable import (  # re-export everything non-tensor as-is
    BayerPattern,
    PackedFormat,
    InputFormat,
    Subsampling,
    JpegException,
    LaplacianParams,
    TonemapParameters,
)


def _to_jax(x):
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return jnp.asarray(x.detach().cpu().numpy())
    except ImportError:
        pass
    return x


def _to_torch(x):
    import torch

    if hasattr(x, 'dtype') and hasattr(x, 'shape') and not isinstance(x, np.ndarray):
        x = np.asarray(x)
    if isinstance(x, np.ndarray):
        return torch.from_numpy(np.ascontiguousarray(x))
    return x


def _wrap_fn(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        args = [_to_jax(a) for a in args]
        kwargs = {k: _to_jax(v) for k, v in kwargs.items()}
        out = fn(*args, **kwargs)
        if isinstance(out, tuple):
            return tuple(_to_torch(o) for o in out)
        return _to_torch(out)

    return wrapped


def _wrap_class(cls):
    class Wrapped:
        def __init__(self, *args, **kwargs):
            self._inner = cls(*[_to_jax(a) for a in args],
                              **{k: _to_jax(v) for k, v in kwargs.items()})

        def __getattr__(self, name):
            attr = getattr(self._inner, name)
            if callable(attr):
                return _wrap_fn(attr)
            return attr

        def __repr__(self):
            return f'torch_compat.{cls.__name__}({self._inner!r})'

    Wrapped.__name__ = cls.__name__
    Wrapped.__qualname__ = cls.__name__
    return Wrapped


# Functions
_FN_NAMES = [
    'apply_white_balance', 'estimate_white_balance',
    'bilinear5x5_demosaic',
    'decode12', 'decode12_float', 'decode12_half', 'decode12_u16',
    'encode', 'encode12_float', 'encode12_u16',
    'rgb_to_bayer', 'estimate_channel_noise',
    'rgb_to_xyz', 'xyz_to_rgb', 'rgb_to_lab', 'lab_to_rgb', 'xyz_to_lab',
    'lab_to_xyz', 'modify_hsl', 'modify_vibrance', 'color_transform_3x3',
    'compute_luminance', 'compute_log_luminance', 'modify_luminance',
    'modify_log_luminance',
    'compute_image_bounds', 'compute_image_metrics',
    'reinhard_tonemap', 'linear_tonemap', 'aces_tonemap',
    'metrics_to_dict', 'metrics_from_dict', 'print_metrics',
]
for _name in _FN_NAMES:
    globals()[_name] = _wrap_fn(getattr(_td, _name))

filmic_tonemap = _wrap_fn(_td.tonemap.filmic_tonemap)

# Workspace classes
PPG = _wrap_class(_td.PPG)
RCD = _wrap_class(_td.RCD)
Bilinear5x5 = _wrap_class(_td.Bilinear5x5)
PostProcess = _wrap_class(_td.PostProcess)
Wiener = _wrap_class(_td.Wiener)
Bilateral = _wrap_class(_td.Bilateral)
Laplacian = _wrap_class(_td.Laplacian)
Jpeg = _wrap_class(_td.Jpeg)

__all__ = _FN_NAMES + [
    'BayerPattern', 'PackedFormat', 'InputFormat', 'Subsampling',
    'JpegException', 'LaplacianParams', 'TonemapParameters',
    'PPG', 'RCD', 'Bilinear5x5', 'PostProcess', 'Wiener', 'Bilateral',
    'Laplacian', 'Jpeg', 'filmic_tonemap',
]
