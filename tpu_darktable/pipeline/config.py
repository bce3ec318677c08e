"""Typed processing configuration with introspectable validators.

Mirror of the reference pipeline/config.py:10-157: pydantic frozen models
whose fields carry range/description metadata through Annotated validators,
so UIs can auto-build sliders (get_validator).  Field names, ranges and
defaults match the reference exactly; settings hash into jit cache keys (the
TPU analog of the reference rebuilding CUDA workspaces on settings change).
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Annotated, Literal, get_args, get_origin

from pydantic import BaseModel, GetCoreSchemaHandler
from pydantic_core import core_schema


class Validator:
    """Base class for introspectable field validators (config.py:10-12)."""

    description: str


class Float(Validator):
    def __init__(self, range: tuple[float, float], description: str, step: float | None = None):
        self.range = range
        self.description = description
        self.step = step

    def __get_pydantic_core_schema__(self, _source_type, _handler: GetCoreSchemaHandler):
        def validate(v):
            v = float(v)
            if not (self.range[0] <= v <= self.range[1]):
                raise ValueError(f'{v} not in [{self.range[0]}, {self.range[1]}]')
            return v

        return core_schema.no_info_plain_validator_function(validate)


class Int(Validator):
    def __init__(self, range: tuple[int, int], description: str, step: int | None = None):
        self.range = range
        self.description = description
        self.step = step

    def __get_pydantic_core_schema__(self, _source_type, _handler: GetCoreSchemaHandler):
        def validate(v):
            v = int(v)
            if not (self.range[0] <= v <= self.range[1]):
                raise ValueError(f'{v} not in [{self.range[0]}, {self.range[1]}]')
            return v

        return core_schema.no_info_plain_validator_function(validate)


class Bool(Validator):
    def __init__(self, description: str):
        self.description = description

    def __get_pydantic_core_schema__(self, _source_type, _handler: GetCoreSchemaHandler):
        def validate(v):
            return bool(v)

        return core_schema.no_info_plain_validator_function(validate)


class EnumValidator[TEnum: Enum](Validator):
    """String <-> enum (and dict-of-enum for per-camera transforms),
    config.py:54-77."""

    def __init__(self, enum_type: type[TEnum], description: str):
        self.enum_type = enum_type
        self.description = description

    def __get_pydantic_core_schema__(self, _source_type, _handler: GetCoreSchemaHandler):
        def validate(v):
            if isinstance(v, self.enum_type):
                return v
            if isinstance(v, str):
                return self.enum_type[v]
            if isinstance(v, dict):
                return {
                    k: self.enum_type[val] if isinstance(val, str) else val
                    for k, val in v.items()
                }
            raise ValueError(f'{v} is not a {self.enum_type.__name__}')

        def serialize(v):
            if isinstance(v, dict):
                return {k: val.name for k, val in v.items()}
            return v.name

        return core_schema.no_info_plain_validator_function(
            validate,
            serialization=core_schema.plain_serializer_function_ser_schema(
                serialize, when_used='always'
            ),
        )


def get_validator(model: type[BaseModel], field_name: str) -> Validator | None:
    """Extract a field's validator for UI introspection (config.py:80-90)."""
    import typing

    hints = typing.get_type_hints(model, include_extras=True)
    annotation = hints.get(field_name)
    if annotation is None:
        return None
    if get_origin(annotation) is Annotated:
        for arg in get_args(annotation)[1:]:
            if isinstance(arg, Validator):
                return arg
    return None


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

    tone_mapping: Annotated[
        ToneMapper, EnumValidator(ToneMapper, description='Tonemapping algorithm')
    ] = ToneMapper.reinhard

    resize_width: Annotated[int, Int(range=(0, 4096), description='Resize width')] = 0

    def save_json(self, path: Path) -> None:
        path.write_text(self.model_dump_json(indent=2))

    @classmethod
    def load_json(cls, path: Path) -> 'ImageProcessingSettings':
        return cls.model_validate_json(path.read_text())
