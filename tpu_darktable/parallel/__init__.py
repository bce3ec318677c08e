"""Multi-chip scaling: device meshes, batch/camera sharding, spatial sharding.

The reference has no distributed layer (SURVEY.md section 2.21); on TPU the
pipeline scales by sharding frame batches over an ICI mesh.  The fused
pipeline program is pure jnp, so sharding its batch axis makes XLA insert
the collectives (the bounds/metrics reductions become all-reduces over ICI)
without any hand-written communication code.
"""

from .mesh import make_grid_mesh, make_mesh, shard_batch, sharded_pipeline
from .spatial import spatial_shard_map_demosaic
from .spatial_pipeline import build_grid_pipeline_fn, build_spatial_pipeline_fn

__all__ = ['build_grid_pipeline_fn', 'build_spatial_pipeline_fn', 'make_grid_mesh',
           'make_mesh', 'shard_batch', 'sharded_pipeline', 'spatial_shard_map_demosaic']
