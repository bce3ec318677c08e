"""Roofline check: is the Wiener stage MXU-bound, and what does precision buy?

Times wiener_denoise at 12MP C=3 under HIGH vs DEFAULT matmul precision and
reports the error DEFAULT introduces vs the HIGH output.  Run alone on the
chip (axon serializes processes silently).
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp

from tpu_darktable.ops.wiener import wiener_denoise
from tpu_darktable.utils.timing import benchmark_op

H, W, C = 3000, 4096, 3
rng = np.random.default_rng(0)
x_np = (rng.random((H, W, C)) * 0.8 + 0.05 + rng.normal(0, 0.03, (H, W, C))).astype(np.float32)
x_np = np.clip(x_np, 0, 1)
x = jnp.asarray(x_np)
sig = jnp.asarray([0.03, 0.03, 0.03], dtype=jnp.float32)

print('devices:', jax.devices(), flush=True)

results = {}
for name, prec in [('HIGH', jax.lax.Precision.HIGH),
                   ('DEFAULT', jax.lax.Precision.DEFAULT),
                   ('HIGHEST', jax.lax.Precision.HIGHEST)]:
    fn = lambda im, p=prec: jnp.clip(wiener_denoise(im, sig, precision=p), 0.0, 1.0)
    t0 = time.perf_counter()
    ms = benchmark_op(fn, x, iters=8)
    print(f'{name}: {ms:.2f} ms  (wall incl compile {time.perf_counter()-t0:.1f}s)', flush=True)
    results[name] = np.asarray(jax.jit(fn)(x))

err_def = np.abs(results['DEFAULT'] - results['HIGHEST'])
err_high = np.abs(results['HIGH'] - results['HIGHEST'])
print(f'DEFAULT vs HIGHEST: max {err_def.max():.3e}  mean {err_def.mean():.3e}')
print(f'HIGH    vs HIGHEST: max {err_high.max():.3e}  mean {err_high.mean():.3e}')

# MXU roofline for reference: tiles * 2 matmuls * K^2*(2R+1)*2 flops
k = 32
ov = 4
stride = k // ov
grid_h = (H + k + stride - 1) // stride + ov
grid_w = (W + k + stride - 1) // stride + ov
n_t = (-(-grid_h // ov) * ov) * (-(-grid_w // ov) * ov) * C
flops = n_t * 2 * (k * k) * (k * k + 5) * 2
print(f'matmul flops/call: {flops/1e12:.2f} Tflop')
