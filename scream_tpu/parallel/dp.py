"""Data parallelism: jit-sharded training and eval steps over the pair batch.

The idiomatic replacement for the reference's bs=1 single-GPU Python loop
(SURVEY.md §2.5): the batch shards over the ``data`` mesh axis, params/opt
state replicate, and XLA inserts the gradient all-reduce over ICI — there is
no hand-written collective in the train step at all.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
from jax.sharding import Mesh

from scream_tpu.parallel.mesh import batch_sharding, replicated


def _batch_axis_sharding(mesh: Mesh, batch_size: int):
    """Leading-axis sharding when the batch divides the data axis, replicated
    otherwise. A trailing partial batch from a drop_last=False loader then
    computes redundantly on EVERY mesh device (identical updates, still
    correct) instead of raising a divisibility error from ``device_put``.
    Note this differs from ``parallel.mesh.to_device_maybe_sharded``, whose
    indivisible-batch fallback leaves arrays on the single default device —
    budget HBM for the replicated case here (e.g. the GAN renderer), not the
    single-device one.
    """
    if batch_size % mesh.shape["data"] == 0:
        return batch_sharding(mesh)
    return replicated(mesh)


def data_parallel_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Constrain an already-jitted ``step(state, batch, ...)`` for DP.

    Wraps the call so the state stays replicated and every batch array is
    sharded on its leading axis; the inner jit then compiles an SPMD program
    whose gradient reduction rides ICI.
    """
    rep = replicated(mesh)

    def wrapped(state, batch: Dict, *args):
        state = jax.device_put(state, rep)
        sh = _batch_axis_sharding(mesh, next(iter(batch.values())).shape[0])
        batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        args = tuple(jax.device_put(a, rep) if a is not None else None for a in args)
        return step_fn(state, batch, *args)

    return wrapped


def data_parallel_apply(apply_fn: Callable, mesh: Mesh) -> Callable:
    """Same constraint pattern for inference: params replicated, batch sharded."""
    rep = replicated(mesh)

    def wrapped(params, *batch_arrays):
        params = jax.device_put(params, rep)
        sh = _batch_axis_sharding(mesh, batch_arrays[0].shape[0])
        arrays = tuple(jax.device_put(a, sh) for a in batch_arrays)
        return apply_fn(params, *arrays)

    return wrapped


def data_parallel_arrays_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """DP constraint for a jitted ``step(state, *arrays)`` (positional-array
    signature, e.g. the discriminator step): state replicated, every array
    sharded on its leading (batch) axis."""
    rep = replicated(mesh)

    def wrapped(state, *arrays):
        state = jax.device_put(state, rep)
        first = next(a for a in arrays if a is not None)
        sh = _batch_axis_sharding(mesh, first.shape[0])
        arrays = tuple(
            jax.device_put(a, sh) if a is not None else None for a in arrays
        )
        return step_fn(state, *arrays)

    return wrapped


def data_seq_parallel_step(step_fn: Callable, mesh: Mesh,
                           seq_keys=("src", "tgt", "src_mask", "tgt_mask")) -> Callable:
    """2-D (data x seq) constraint for a jitted ``step(state, batch, ...)``.

    Pairs shard over ``data`` and the *points within each cloud* shard over
    ``seq`` — the training-time use of the sequence-parallel story
    (`scream_tpu/parallel/sp.py`): GSPMD propagates the point sharding
    through the linear-attention einsums, whose only cross-shard term is the
    tiny KV/K-sum reduction, and through the masked loss. Params and
    optimizer state stay replicated; the data-axis gradient all-reduce and
    the seq-axis attention reductions are both XLA-inserted.

    ``seq_keys`` names the batch entries whose axis 1 is the point dimension
    (coordinates and masks); everything else shards on batch only.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def seq_sharding(ndim):
        return NamedSharding(mesh, P("data", "seq", *([None] * (ndim - 2))))

    n_data = mesh.shape["data"]
    n_seq = mesh.shape["seq"]

    def wrapped(state, batch: Dict, *args):
        state = jax.device_put(state, rep)
        out = {}
        # Same shard-or-fallback policy as data_parallel_step: a partial
        # trailing batch replicates (redundant but correct); a point axis
        # that does not divide the seq axis shards on batch only.
        b = next(iter(batch.values())).shape[0]
        for k, v in batch.items():
            if b % n_data != 0:
                out[k] = jax.device_put(v, rep)
            elif k in seq_keys and v.ndim >= 2 and v.shape[1] % n_seq == 0:
                out[k] = jax.device_put(v, seq_sharding(v.ndim))
            else:
                out[k] = jax.device_put(v, data_sh)
        args = tuple(jax.device_put(a, rep) if a is not None else None for a in args)
        return step_fn(state, out, *args)

    return wrapped
