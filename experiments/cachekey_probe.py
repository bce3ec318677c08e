#!/usr/bin/env python
"""Per-component persistent-cache-key probe (VERDICT r3 item 1c).

Lowers the exact FULL bench program and prints the hash of EACH cache-key
component (computation / jaxlib version / backend version / XLA flags /
compile options / accelerator config) so two fresh-process runs can be
diffed to find which component is nondeterministic.
"""

import hashlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tpu_darktable as td
    from tpu_darktable.pipeline.config import Debayer, ImageProcessingSettings, ToneMapper
    from tpu_darktable.pipeline.image_processor import build_pipeline_fn

    batch = int(os.environ.get('TD_BENCH_BATCH', '16'))
    width = int(os.environ.get('TD_BENCH_W', '4096'))
    height = int(os.environ.get('TD_BENCH_H', '3000'))

    settings = ImageProcessingSettings(
        debayer=Debayer.rcd,
        postprocess=True,
        enable_denoise=True,
        enable_bilateral=True,
        tone_mapping=ToneMapper.adaptive_aces,
        tone_gamma=1.5,
        tone_intensity=2.0,
        light_adapt=0.8,
        vibrance=0.5,
    )
    fn = jax.jit(
        build_pipeline_fn(
            settings, (width, height), td.BayerPattern.RGGB, td.PackedFormat.Packed12, True
        )
    )

    n_bytes = height * width * 3 // 2
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (batch, n_bytes), dtype=np.uint8))
    wb = jnp.asarray([1.2, 1.0, 1.1], dtype=jnp.float32)
    bounds = jnp.zeros(2, jnp.float32)
    metrics = jnp.zeros(5, jnp.float32)
    alpha = jnp.float32(1.0)
    lowered = fn.lower(data, wb, bounds, metrics, alpha)

    from jax._src import cache_key as ck
    module = lowered.compiler_ir('stablehlo')
    co = lowered.compile_args['compile_options'] if hasattr(lowered, 'compile_args') else None
    # Pull compile options the way jax does for the real compile.
    from jax._src.interpreters import pxla  # noqa: F401
    exec_obj = lowered._lowering  # Lowering object
    backend = jax.devices()[0].client
    devices = np.array([[jax.devices()[0]]])

    import jaxlib
    from jax._src.lib import version_str as jaxlib_version_str

    entries = [
        ('computation', lambda h: ck._hash_computation(h, module, ck.IgnoreCallbacks.NO)),
        ('jaxlib version', lambda h: h.update(bytes(jaxlib_version_str.encode('utf-8')))),
        ('backend version', lambda h: ck._hash_platform(h, backend)),
        ('XLA flags', lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes())),
        ('accelerator config', lambda h: ck._hash_accelerator_config(h, devices, backend)),
    ]
    for name, fn_h in entries:
        h = hashlib.sha256()
        try:
            fn_h(h)
            print(f'{name}: {h.hexdigest()}')
        except Exception as e:
            print(f'{name}: ERROR {e}')

    # The compile options jax would actually use for this jit:
    try:
        co = lowered._lowering.compile_args.get('compile_options', None)
    except Exception:
        co = None
    if co is None:
        # Reconstruct the way jax's UnloadedMeshExecutable does.
        print('compile_options: (not directly exposed; hashing via full key twice)')
    else:
        h = hashlib.sha256()
        ck._hash_serialized_compile_options(h, co, strip_device_assignment=False)
        print(f'compile_options: {h.hexdigest()}')
        # Dump the debug repr for diffing.
        with open(f'/tmp/compile_opts_{os.getpid()}.txt', 'w') as f:
            f.write(ck._serialize_compile_options(co).SerializeToString().hex()
                    if hasattr(ck, '_serialize_compile_options') else repr(co))


if __name__ == '__main__':
    main()
