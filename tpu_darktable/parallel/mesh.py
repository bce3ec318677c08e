"""Device mesh + batch sharding for the fused pipeline.

Data-parallel scaling of the ISP (the DP analog in SURVEY.md section 2.21):
frame batches shard over the 'batch' mesh axis; global statistics (bounds,
metrics) are jnp reductions over the full batch, which XLA lowers to psum
collectives over ICI automatically.  Multi-camera rigs (e.g. the 12-camera
beetroot config) map one-or-more cameras per chip via the same axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = 'batch') -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_grid_mesh(camera_ways: int, band_ways: int, devices=None,
                   camera_axis: str = 'camera', band_axis: str = 'band') -> Mesh:
    """2-D (camera, band) mesh: frames shard over cameras, each frame's rows
    over bands (the v5e-8 rig deployment shape, e.g. 4x2 for a 12-camera rig
    at half-frame latency).  Camera groups are adjacent devices so the
    latency-critical band collectives ride neighboring ICI links."""
    if devices is None:
        devices = jax.devices()
    need = camera_ways * band_ways
    if len(devices) < need:
        raise ValueError(f'need {need} devices for a {camera_ways}x{band_ways} '
                         f'mesh, have {len(devices)}')
    grid = np.asarray(devices[:need]).reshape(camera_ways, band_ways)
    return Mesh(grid, (camera_axis, band_axis))


def shard_batch(array, mesh: Mesh, axis_name: str = 'batch'):
    """Place a batch-leading array with its leading axis sharded on the mesh."""
    spec = P(axis_name, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def sharded_pipeline(fused_fn, mesh: Mesh, axis_name: str = 'batch'):
    """Jit the fused pipeline with batch-axis input sharding.

    `fused_fn` is a build_pipeline_fn result: (bytes, wb, bounds, metrics,
    alpha) -> (u8, bounds', metrics').  Bytes shard over the batch; the
    scalar state replicates; outputs keep the batch sharded and the state
    replicated.  XLA inserts the cross-chip reductions for the EMA stats.
    """
    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fused_fn,
        in_shardings=(batch, repl, repl, repl, repl),
        out_shardings=(batch, repl, repl),
    )
