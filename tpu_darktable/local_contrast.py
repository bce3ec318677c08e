"""Public local contrast module - mirrors reference local_contrast.py."""

from __future__ import annotations


from ._jit import jit_with_static
from .ops import color as _color
from .ops.bilateral import bilateral_process as _bilateral_process
from .ops.laplacian import LaplacianParams, local_laplacian as _local_laplacian


class Laplacian:
    """Local-Laplacian workspace (reference local_contrast.py:22-77)."""

    def __init__(self, device=None, image_size=None, params: LaplacianParams | None = None):
        if params is None and isinstance(device, (tuple, list)):
            device, image_size, params = None, tuple(device), image_size
        if params is None:
            params = LaplacianParams()
        if image_size is None:
            raise TypeError('image_size is required')
        self._width, self._height = tuple(image_size)
        if params.num_gamma != 6:
            # The reference factory only accepts 6 (laplacian.cu:625-634);
            # we support other values but flag the divergence.
            pass
        self._params = params
        self._fn = jit_with_static(_local_laplacian, params=params)

    def process(self, input_tensor):
        expected = (self._height, self._width)
        if tuple(input_tensor.shape) != expected:
            raise RuntimeError(
                f'Laplacian input shape {input_tensor.shape} != expected {expected}'
            )
        return self._fn(input_tensor)

    def process_rgb(self, input_image):
        """Luminance round-trip (reference local_contrast.py:54-57)."""
        luminance = _color.compute_luminance(input_image)
        return _color.modify_luminance(input_image, self.process(luminance))

    @property
    def image_size(self) -> tuple[int, int]:
        return (self._width, self._height)

    @property
    def sigma(self) -> float:
        return self._params.sigma

    @property
    def shadows(self) -> float:
        return self._params.shadows

    @property
    def highlights(self) -> float:
        return self._params.highlights

    @property
    def clarity(self) -> float:
        return self._params.clarity


class Bilateral:
    """Bilateral grid workspace (reference local_contrast.py:80-137)."""

    def __init__(self, device=None, image_size=None, *, sigma_s: float, sigma_r: float):
        if image_size is None and isinstance(device, (tuple, list)):
            device, image_size = None, tuple(device)
        if image_size is None:
            raise TypeError('image_size is required')
        self._width, self._height = tuple(image_size)
        self._sigma_s = float(sigma_s)
        self._sigma_r = float(sigma_r)

    def _fn(self, detail: float):
        return jit_with_static(
            _bilateral_process,
            sigma_s=self._sigma_s,
            sigma_r=self._sigma_r,
            detail=float(detail),
        )

    def process(self, luminance, detail: float):
        expected = (self._height, self._width)
        if tuple(luminance.shape) != expected:
            raise RuntimeError(
                f'Bilateral input shape {luminance.shape} != expected {expected}'
            )
        return self._fn(detail)(luminance)

    def process_rgb(self, input_image, detail: float):
        """Luminance round-trip (reference local_contrast.py:110-114)."""
        luminance = _color.compute_luminance(input_image)
        return _color.modify_luminance(input_image, self.process(luminance, float(detail)))

    def process_log_rgb(self, input_image, detail: float, eps: float = 1e-6):
        """Log-luminance round-trip (reference local_contrast.py:117-125)."""
        log_luminance = _color.compute_log_luminance(input_image, eps)
        return _color.modify_log_luminance(
            input_image, self.process(log_luminance, float(detail)), eps
        )

    @property
    def image_size(self) -> tuple[int, int]:
        return (self._width, self._height)

    @property
    def sigma_s(self) -> float:
        return self._sigma_s

    @property
    def sigma_r(self) -> float:
        return self._sigma_r


__all__ = ['Bilateral', 'Laplacian', 'LaplacianParams']
