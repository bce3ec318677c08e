"""Public API surface: the reference's exported names all resolve here.

The reference's flat __init__ exports ~58 names (torch_darktable/
__init__.py:4-114) and its low-level binding module is reachable as
`torch_darktable.extension` (extension.py:1-5); migrated user code must find
every one of them on `tpu_darktable` / `tpu_darktable.extension`.
"""

import tpu_darktable as td
from tpu_darktable import extension

# torch_darktable/__init__.py __all__ (reference @ 2025-11-14), minus
# torch-specific loader internals that have documented equivalents here.
REFERENCE_EXPORTS = [
    # submodules
    'bayer', 'color_conversion', 'debayer', 'denoise', 'extension', 'jpeg',
    'local_contrast', 'tonemap', 'white_balance',
    # classes / enums
    'BayerPattern', 'PackedFormat', 'PPG', 'RCD', 'PostProcess', 'Laplacian',
    'LaplacianParams', 'Bilateral', 'Wiener', 'Jpeg', 'JpegException',
    'InputFormat', 'Subsampling', 'TonemapParameters',
    # functions
    'aces_tonemap', 'apply_white_balance', 'compute_image_bounds',
    'compute_image_metrics', 'compute_log_luminance', 'compute_luminance',
    'color_transform_3x3', 'decode12', 'decode12_float', 'decode12_half',
    'decode12_u16', 'encode', 'encode12_float', 'encode12_u16',
    'estimate_channel_noise', 'estimate_white_balance', 'lab_to_rgb',
    'lab_to_xyz', 'linear_tonemap', 'load_as_bayer', 'metrics_from_dict',
    'metrics_to_dict', 'modify_hsl', 'modify_log_luminance',
    'modify_luminance', 'modify_vibrance', 'print_metrics',
    'reinhard_tonemap', 'rgb_to_bayer', 'rgb_to_lab', 'rgb_to_xyz',
    'xyz_to_lab', 'xyz_to_rgb',
]

# Names only the C++ binding exported (extension.cpp m.def/class_ list);
# reachable through the extension shim with the binding-level spellings.
BINDING_EXPORTS = [
    'adaptive_aces_tonemap', 'bilinear5x5_demosaic', 'TonemapParams',
    'JpegInputFormat', 'JpegSubsampling', 'decode12_float', 'decode12_half',
    'decode12_u16', 'encode12_float', 'encode12_u16', 'RCD', 'PPG',
    'PostProcess', 'Laplacian', 'Bilateral', 'Wiener', 'Jpeg',
    'BayerPattern', 'JpegException',
]


def test_reference_top_level_names():
    missing = [n for n in REFERENCE_EXPORTS if not hasattr(td, n)]
    assert not missing, missing


def test_binding_surface_names():
    missing = [n for n in BINDING_EXPORTS if not hasattr(extension, n)]
    assert not missing, missing


def test_extension_aliases_point_at_real_objects():
    assert extension.TonemapParams is td.TonemapParameters
    assert extension.JpegInputFormat is td.InputFormat
    assert extension.JpegSubsampling is td.Subsampling
    assert extension.Wiener is td.Wiener


def test_extension_unknown_attribute():
    try:
        extension.definitely_not_a_thing
    except AttributeError as e:
        assert 'definitely_not_a_thing' in str(e)
    else:
        raise AssertionError('expected AttributeError')


def test_typed_stub_matches_runtime():
    """Every name declared in extension.pyi resolves at runtime, and the
    package ships a py.typed marker (reference: the hand-written
    torch_darktable_extension.pyi:1-203 IDE-checkable surface)."""
    import ast
    from pathlib import Path

    pkg = Path(td.__file__).parent
    assert (pkg / 'py.typed').exists()
    stub = ast.parse((pkg / 'extension.pyi').read_text())
    declared = []
    for node in stub.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef)):
            declared.append(node.name)
        elif isinstance(node, ast.Assign):
            declared.extend(t.id for t in node.targets if isinstance(t, ast.Name))
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            declared.append(node.target.id)
    declared = [n for n in declared if n not in {'Array', 'ArrayLike'}]
    assert len(declared) > 50, f'stub suspiciously small: {len(declared)} names'
    missing = [n for n in declared if not hasattr(extension, n)]
    assert not missing, missing

    # Spot-check stubbed method lists against the real classes.
    for cls_name in ('Wiener', 'Bilateral', 'PPG', 'Jpeg'):
        node = next(n for n in stub.body
                    if isinstance(n, ast.ClassDef) and n.name == cls_name)
        cls = getattr(td, cls_name)
        for item in node.body:
            if isinstance(item, ast.FunctionDef):
                assert hasattr(cls, item.name), (cls_name, item.name)
