"""Low-level binding-surface compatibility shim.

The reference exposes its C++/CUDA binding module as
`torch_darktable.extension` (extension.py:1-5, extension.cpp:50-248) and
both its own wrappers and downstream user code reach classes/functions
through it (`extension.RCD`, `extension.decode`, `extension.TonemapParams`,
...).  This framework has no separate binding layer - every op is a
JAX-callable - so the "extension" is simply the public package surface:
attribute access resolves lazily against `tpu_darktable` itself, keeping
`from tpu_darktable import extension; extension.Wiener(...)` working for
migrated code.
"""

from __future__ import annotations

# Binding-level spellings that differ from the Python-level API
# (extension.cpp:63,121,210 vs tonemap.py / jpeg.py wrapper names).
_ALIASES = {
    'TonemapParams': 'TonemapParameters',
    'JpegInputFormat': 'InputFormat',
    'JpegSubsampling': 'Subsampling',
}


def __getattr__(name: str):
    import tpu_darktable

    try:
        return getattr(tpu_darktable, _ALIASES.get(name, name))
    except AttributeError:
        pass
    # functions the binding exports but the reference keeps submodule-level
    # in Python (e.g. adaptive_aces_tonemap extension.cpp:160,
    # create_wiener extension.cpp:178)
    for sub in (tpu_darktable.tonemap, tpu_darktable.color_conversion,
                tpu_darktable.denoise, tpu_darktable.debayer):
        if hasattr(sub, name):
            return getattr(sub, name)
    raise AttributeError(
        f"module 'tpu_darktable.extension' has no attribute {name!r}"
    )


def __dir__():
    import tpu_darktable

    return sorted(set(dir(tpu_darktable)))
