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


def data_parallel_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Constrain an already-jitted ``step(state, batch, ...)`` for DP.

    Wraps the call so the state stays replicated and every batch array is
    sharded on its leading axis; the inner jit then compiles an SPMD program
    whose gradient reduction rides ICI.
    """
    rep = replicated(mesh)
    sh = batch_sharding(mesh)

    def wrapped(state, batch: Dict, *args):
        state = jax.device_put(state, rep)
        batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        args = tuple(jax.device_put(a, rep) if a is not None else None for a in args)
        return step_fn(state, batch, *args)

    return wrapped


def data_parallel_apply(apply_fn: Callable, mesh: Mesh) -> Callable:
    """Same constraint pattern for inference: params replicated, batch sharded."""
    rep = replicated(mesh)
    sh = batch_sharding(mesh)

    def wrapped(params, *batch_arrays):
        params = jax.device_put(params, rep)
        arrays = tuple(jax.device_put(a, sh) for a in batch_arrays)
        return apply_fn(params, *arrays)

    return wrapped
