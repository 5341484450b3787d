"""SPMD scale-out over jax.sharding meshes.

The reference is single-GPU with zero distributed code (SURVEY.md §2.9).
Here scale-out is first-class: a (data, model) device mesh, data-parallel
batch sharding, tensor-parallel sharding of the head/feature axes of the
parameter banks, and (stage 8) edge-partitioned multi-host aggregation with
boundary all-to-all. XLA GSPMD inserts the collectives (psum for grads over
'data', all-gather/reduce-scatter along 'model') so they ride ICI.
"""

from pyhgt_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_params,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "replicate",
]
