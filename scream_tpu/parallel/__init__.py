"""Parallel layer: device meshes, data parallelism, sequence parallelism."""

from scream_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from scream_tpu.parallel.dp import data_parallel_apply, data_parallel_step
from scream_tpu.parallel.sp import sequence_parallel_linear_attention

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "data_parallel_apply",
    "data_parallel_step",
    "sequence_parallel_linear_attention",
]
