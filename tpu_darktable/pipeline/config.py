"""Typed processing configuration with introspectable validators.

TPU-native counterpart of the reference config layer (pipeline/config.py:
10-157): pydantic frozen models whose fields carry range/description/step
metadata through Annotated markers, so UIs can auto-build sliders
(get_validator).  The *schema* — field names, ranges, defaults, enum values
— is the reference's public API surface and matches it exactly; settings
hash into jit cache keys (the TPU analog of the reference rebuilding CUDA
workspaces on settings change).  The validator machinery itself is this
repo's own: one base class owning the pydantic plumbing, subclasses supply
a `coerce` hook and optional serializer.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Annotated, Literal, get_args, get_origin, get_type_hints

from pydantic import BaseModel, GetCoreSchemaHandler
from pydantic_core import core_schema


class Validator:
    """UI-introspectable field constraint, attached via ``Annotated``.

    Subclasses implement ``coerce(value) -> value`` (raising ValueError on
    constraint violation) and may override ``serialize`` for custom JSON
    forms.  The pydantic-core schema wiring lives here once, so subclasses
    stay declarative.  Counterpart of reference config.py:10-77.
    """

    description: str = ''

    def coerce(self, value):
        return value

    serialize = None  # optional: fn(value) -> json-compatible value

    def __get_pydantic_core_schema__(self, _source_type, _handler: GetCoreSchemaHandler):
        schema = core_schema.no_info_plain_validator_function(self.coerce)
        if self.serialize is not None:
            schema['serialization'] = core_schema.plain_serializer_function_ser_schema(
                self.serialize, when_used='always'
            )
        return schema


class _NumberInRange(Validator):
    """Shared numeric range check; `_cast` picks the target type."""

    _cast: type

    def __init__(self, range, description: str, step=None):
        self.range = range
        self.description = description
        self.step = step

    def coerce(self, value):
        value = self._cast(value)
        lo, hi = self.range
        if value < lo or value > hi:
            raise ValueError(f'{value} not in [{lo}, {hi}]')
        return value


class Float(_NumberInRange):
    _cast = float


class Int(_NumberInRange):
    _cast = int


class Bool(Validator):
    def __init__(self, description: str):
        self.description = description

    coerce = staticmethod(bool)


class EnumValidator[TEnum: Enum](Validator):
    """Name-string <-> enum member, plus dict-of-enum values (the per-camera
    transform maps in beetroot.json).  Counterpart of config.py:54-77."""

    def __init__(self, enum_type: type[TEnum], description: str):
        self.enum_type = enum_type
        self.description = description

    def _member(self, value):
        if isinstance(value, self.enum_type):
            return value
        if isinstance(value, str):
            return self.enum_type[value]
        raise ValueError(f'{value} is not a {self.enum_type.__name__}')

    def coerce(self, value):
        if isinstance(value, dict):
            return {key: self._member(item) for key, item in value.items()}
        return self._member(value)

    @staticmethod
    def serialize(value):
        if isinstance(value, dict):
            return {key: item.name for key, item in value.items()}
        return value.name


def get_validator(model: type[BaseModel], field_name: str) -> Validator | None:
    """Extract a field's validator for UI introspection (config.py:80-90).

    Uses get_type_hints (not raw __annotations__) so string annotations under
    `from __future__ import annotations` still resolve.
    """
    annotation = get_type_hints(model, include_extras=True).get(field_name)
    if get_origin(annotation) is not Annotated:
        return None
    markers = [arg for arg in get_args(annotation)[1:] if isinstance(arg, Validator)]
    return markers[0] if markers else None


class ToneMapper(Enum):
    linear = 0
    reinhard = 1
    aces = 2
    adaptive_aces = 3
    filmic = 4  # new capability (BASELINE.json config 4); not in the reference


class Debayer(Enum):
    bilinear = 0
    ppg = 1
    rcd = 2


def clamp(x, lower, upper):
    return min(max(x, lower), upper)


class ImageProcessingSettings(BaseModel, frozen=True):
    """The ~20-knob processing config (config.py:110-157), field-for-field."""

    type: Literal['image_processing_settings'] = 'image_processing_settings'

    tone_gamma: Annotated[float, Float(range=(0.1, 5.0), description='Gamma')] = 0.75
    tone_intensity: Annotated[float, Float(range=(-1.0, 5.0), description='Intensity')] = 2.0
    light_adapt: Annotated[float, Float(range=(0.0, 1.0), description='Light adaptation')] = 1.0

    vibrance: Annotated[float, Float(range=(-1.0, 1.0), description='Vibrance')] = 0.0

    moving_average: Annotated[
        float, Float(range=(0.0, 1.0), description='Tonemap moving average')
    ] = 0.02

    debayer: Annotated[Debayer, EnumValidator(Debayer, description='Debayer algorithm')] = (
        Debayer.rcd
    )
    ppg_median_threshold: float = 0.0

    postprocess: Annotated[bool, Bool(description='Postprocess debayer')] = False
    green_eq_threshold: float = 0.04
    color_smoothing_passes: int = 3

    enable_bilateral: Annotated[bool, Bool(description='Enable bilateral constrast enhancement')] = False
    # Local-Laplacian alternative for the local-contrast stage (new
    # capability: the reference builds Laplacian workspaces but never calls
    # them in its pipeline; the north-star chain names it explicitly).
    enable_laplacian: Annotated[bool, Bool(description='Enable local-Laplacian contrast')] = False
    lap_sigma: float = 0.2
    lap_shadows: float = 1.0
    lap_highlights: float = 1.0
    lap_clarity: float = 0.0
    bilateral: Annotated[
        float, Float(range=(0.0, 1.0), description='Bilateral constrast enhancement amount')
    ] = 0.4

    bil_sigma_spatial: float = 2.0
    bil_sigma_luminance: float = 0.2

    enable_denoise: Annotated[bool, Bool(description='Enable denoise')] = True
    denoise: Annotated[float, Float(range=(0.0, 1.0), description='Denoise amount')] = 0.075
    # Wiener tile-overlap factor (reference denoise.py:26-32 supports 2/4/8;
    # its pipeline pins 4).  2 is ~3x faster on TPU at bounded quality cost -
    # exposed as a speed/quality knob, default matches the reference pipeline.
    denoise_overlap: Annotated[
        int, Int(range=(2, 8), description='Denoise tile overlap factor', step=2)
    ] = 4
    # f16 STORAGE of the Wiener spectral intermediates (math stays f32).
    # Halves the dominant stage's HBM traffic: 41 -> 25 ms at 12MP ov=4.
    # Oracle error 4e-4 vs the fp32 path's 5e-5, inside the 1e-3 parity
    # budget (BASELINE.json); bf16 storage measures 1.4e-3+ and is rejected.
    denoise_f16: Annotated[
        bool, Bool(description='Store Wiener spectra in float16 (faster)')
    ] = True

    tone_mapping: Annotated[
        ToneMapper, EnumValidator(ToneMapper, description='Tonemapping algorithm')
    ] = ToneMapper.reinhard

    resize_width: Annotated[int, Int(range=(0, 4096), description='Resize width')] = 0

    def save_json(self, path: Path) -> None:
        path.write_text(self.model_dump_json(indent=2))

    @classmethod
    def load_json(cls, path: Path) -> 'ImageProcessingSettings':
        return cls.model_validate_json(path.read_text())
