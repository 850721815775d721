"""Batch-dim SPMD partitioning for the fused Pallas ops.

XLA's SPMD partitioners (Shardy/GSPMD) treat a Mosaic custom call as opaque:
they cannot infer how to split it across a `jax.sharding.Mesh`, which is why
the fused attention kernels (`ops/attn_pallas.py`, `ops/ffn_pallas.py`)
historically fell back to the unfused XLA graph under ``--mesh``. Both ops
are embarrassingly parallel over the pair batch — every (B, ...) operand row
is an independent point-cloud pair and the weights are replicated — so the
idiomatic fix is :func:`jax.experimental.custom_partitioning.custom_partitioning`:
declare that the op shards on the leading batch dim, replicate everything
else, and let the partitioner run the *same kernel per shard* with no
collectives at all.

:func:`batch_partitioned` wraps a fused-op impl accordingly. Data-parallel
meshes (``--mesh data=N``) then keep the Pallas path; seq/model-sharded
applies still use the unfused graph (a proposal to shard a non-batch dim
would be answered with a forced replication — correct, but a resharding
collective the unfused path does not need — so call sites gate on
:func:`scream_tpu.parallel.mesh.is_data_only`).

Inside `jax.shard_map` (manual axes bound at trace time) the raw impl is
used instead: ``custom_partitioning`` is an SPMD-partitioner construct with
no meaning under manual sharding, while a plain ``pallas_call`` per device
is exactly what shard_map bodies want (the pipeline-parallel stage path).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P, get_abstract_mesh


def _proposed_batch_axes(arg_infos, batch_operands):
    """The mesh axes the partitioner proposes for the batch dim: the first
    non-None leading-dim entry among the batch-carrying operands."""
    for i in batch_operands:
        sh = getattr(arg_infos[i], "sharding", None)
        spec = getattr(sh, "spec", None) if sh is not None else None
        if spec is not None and len(spec) > 0 and spec[0] is not None:
            return spec[0]
    return None


def batch_partitioned(
    impl: Callable,
    operand_mappings: Sequence[Tuple[str, ...]],
    result_mapping: Tuple[str, ...],
    batch_operands: Sequence[int],
) -> Callable:
    """Make a batch-parallel op partitionable over the leading (batch) dim.

    Args:
      impl: the op body (positional array args -> one array). Must accept
        any batch size — it is invoked on per-shard views.
      operand_mappings: one factor-name tuple per operand (einsum-style,
        e.g. ``("b", "l", "d")``) for the Shardy sharding rule. Factors
        shared between mappings must have equal sizes; the batch factor of
        every operand in ``batch_operands`` must be the leading one.
      result_mapping: factor names of the (single) result; its leading
        factor is the batch.
      batch_operands: operand indices whose dim 0 is the shared batch.

    Returns a callable with impl's signature that runs per-shard under an
    SPMD mesh (batch sharded, everything else replicated), and falls back to
    the raw impl inside shard_map.

    Not ``jax.vmap``-able: ``custom_partitioning`` has no batching rule, so
    the wrapper (which is on the plain single-chip path too) rejects a
    mapped axis. Callers must flatten extra batch dims into the one leading
    batch axis first — the same contract the underlying ``pallas_call``
    already imposes (CLAUDE.md's nested-vmap Pallas rule).
    """
    def _body(*args):
        # custom_partitioning resolves the wrapped callable's signature; a
        # functools.partial with bound keywords breaks that resolution, so
        # give it a plain positional wrapper.
        return impl(*args)

    cp = custom_partitioning(_body)
    batch_operands = tuple(batch_operands)

    def _shardings(mesh, b):
        def one(mapping, batched):
            dims = [b if (batched and j == 0) else None
                    for j in range(len(mapping))]
            return NamedSharding(mesh, P(*dims))

        args = tuple(one(m, i in batch_operands)
                     for i, m in enumerate(operand_mappings))
        out = one(result_mapping, True)
        return args, out

    def partition(mesh, arg_infos, result_infos):
        b = _proposed_batch_axes(arg_infos, batch_operands)
        arg_shardings, out_sharding = _shardings(mesh, b)
        return mesh, impl, out_sharding, arg_shardings

    def infer(mesh, arg_infos, result_infos):
        b = _proposed_batch_axes(arg_infos, batch_operands)
        _, out_sharding = _shardings(mesh, b)
        return out_sharding

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=SdyShardingRule(
            operand_mappings=tuple(tuple(m) for m in operand_mappings),
            result_mappings=(tuple(result_mapping),),
        ),
    )

    def op(*args):
        if get_abstract_mesh().manual_axes:
            return impl(*args)
        return cp(*args)

    return op
