"""Parallel layer: device meshes and data / sequence / tensor / pipeline /
expert parallelism (the reference has none of these — SURVEY.md §2.5)."""

from scream_tpu.parallel.mesh import (
    batch_sharding,
    is_data_only,
    make_mesh,
    parse_mesh_spec,
    replicate,
    replicated,
    shard_batch,
)
from scream_tpu.parallel.dp import (
    data_parallel_apply,
    data_parallel_arrays_step,
    data_parallel_step,
    data_seq_parallel_step,
)
from scream_tpu.parallel.sp import sequence_parallel_linear_attention
from scream_tpu.parallel.tp import (
    shard_params_tensor_parallel,
    tensor_parallel_apply,
    tensor_parallel_specs,
    tensor_parallel_step,
)
from scream_tpu.parallel.pp import (
    make_pipeline_mesh,
    pipeline_parallel_apply,
    pipeline_parallel_grads,
    pipeline_train_step,
    stack_stage_params,
)
from scream_tpu.parallel.ep import (
    expert_parallel_moe_ffn,
    init_moe_ffn_params,
    make_expert_mesh,
    moe_ffn_reference,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "is_data_only",
    "parse_mesh_spec",
    "replicate",
    "replicated",
    "shard_batch",
    "data_parallel_apply",
    "data_parallel_arrays_step",
    "data_parallel_step",
    "data_seq_parallel_step",
    "sequence_parallel_linear_attention",
    "shard_params_tensor_parallel",
    "tensor_parallel_apply",
    "tensor_parallel_specs",
    "tensor_parallel_step",
    "make_pipeline_mesh",
    "pipeline_parallel_apply",
    "pipeline_parallel_grads",
    "pipeline_train_step",
    "stack_stage_params",
    "expert_parallel_moe_ffn",
    "init_moe_ffn_params",
    "make_expert_mesh",
    "moe_ffn_reference",
]
