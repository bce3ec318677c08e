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
