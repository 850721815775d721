"""Tensor parallelism: Megatron-style sharding of the attention blocks.

The reference has no tensor parallelism (one pinned GPU, SURVEY.md §2.5).
This is the framework's capability layer for models too large to replicate:
parameters shard over a ``model`` mesh axis and XLA/GSPMD inserts the
collectives — there is no hand-written communication here at all, only
`NamedSharding` annotations on the parameter pytree.

The sharding recipe is the classic two-matmul pattern per block
(`scream_tpu/models/attention.py` `AttentionBlock`):

  * column-parallel: ``q_proj`` / ``k_proj`` / ``v_proj`` kernels shard their
    *output* features — each chip owns ``num_heads / n_model`` attention
    heads and runs the whole linear-attention contraction locally;
    ``ffn_in`` likewise shards the hidden dimension.
  * row-parallel: ``merge`` and ``ffn_out`` kernels shard their *input*
    features — each chip produces a partial sum and GSPMD reduces once per
    matmul (2 all-reduces per block, the Megatron minimum).
  * everything else (LayerNorms, embedding, coordinate head, biases)
    replicates — it is tiny.

Requires ``num_heads % n_model == 0`` (so the per-head reshape stays aligned
with the kernel's column sharding) and ``d_model * ffn_mult % n_model == 0``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Kernels whose OUTPUT features shard (column-parallel) / whose INPUT
# features shard (row-parallel). Matches AttentionBlock submodule names.
_COLUMN_PARALLEL = frozenset({"q_proj", "k_proj", "v_proj", "ffn_in"})
_ROW_PARALLEL = frozenset({"merge", "ffn_out"})


def _path_names(path) -> tuple:
    return tuple(p.key for p in path if hasattr(p, "key"))


def _spec_for(names: tuple, axis: str) -> P:
    if names and names[-1] == "kernel" and len(names) >= 2:
        parent = names[-2]
        if parent in _COLUMN_PARALLEL:
            return P(None, axis)
        if parent in _ROW_PARALLEL:
            return P(axis, None)
    return P()


def tensor_parallel_specs(params, axis: str = "model"):
    """PartitionSpec pytree (same structure as ``params``) for Megatron TP.

    Dense kernels inside attention blocks get column/row specs; everything
    else replicates.
    """
    return jax.tree_util.tree_map_with_path(
        lambda p, _: _spec_for(_path_names(p), axis), params
    )


def shard_params_tensor_parallel(params, mesh: Mesh, axis: str = "model"):
    """Device-put a param pytree with Megatron column/row shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: jax.device_put(
            v, NamedSharding(mesh, _spec_for(_path_names(p), axis))
        ),
        params,
    )


def tensor_parallel_apply(
    apply_fn: Callable,
    mesh: Mesh,
    params,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Callable:
    """Wrap ``apply_fn(params, *arrays)`` for combined data+tensor parallelism.

    Params shard over ``model_axis`` (column/row per the Megatron recipe),
    batch arrays shard their leading dim over ``data_axis``; jit + GSPMD
    propagate the shardings through the whole forward and insert the
    per-block all-reduces over ICI.
    """
    params = shard_params_tensor_parallel(params, mesh, model_axis)
    batch_sh = NamedSharding(mesh, P(data_axis))
    jitted = jax.jit(apply_fn)

    def wrapped(*arrays):
        arrays = tuple(jax.device_put(jnp.asarray(a), batch_sh) for a in arrays)
        return jitted(params, *arrays)

    return wrapped


def tensor_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Callable:
    """Constrain a jitted ``step(state, batch, ...)`` for 2-D (data x model)
    parallelism.

    The train-state params shard over ``model_axis``; gradients and Adam
    moments inherit the same layout through GSPMD propagation (the moment
    pytrees mirror the param tree leaf-for-leaf, so they are device_put with
    the matching spec up front). The batch shards over ``data_axis``. Both
    the data-axis gradient all-reduce and the per-block Megatron reductions
    are XLA-inserted.
    """
    batch_sh = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    # The optimizer-moment layout is resolved ONCE per (param treedef,
    # opt treedef, leaf shapes) by suffix-matching moment-leaf paths against
    # param paths (optax moment trees embed the param tree: their leaf paths
    # end with the param's path and shapes match). The resolved flat sharding
    # list is cached so the hot path is a zip of no-op device_puts, not an
    # O(#opt-leaves x #params) Python matching loop every step.
    cache = {}

    def _resolve_opt_shardings(params, opt_state):
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        by_path = {
            _path_names(p): (_spec_for(_path_names(p), model_axis), v.shape)
            for p, v in leaves
        }

        def sharding_for(path, leaf):
            if not hasattr(leaf, "shape"):
                return None
            names = _path_names(path)
            for k, (s, shape) in by_path.items():
                if k and names[-len(k):] == k and leaf.shape == shape:
                    return NamedSharding(mesh, s)
            return rep

        with_path = jax.tree_util.tree_flatten_with_path(opt_state)[0]
        return [sharding_for(p, l) for p, l in with_path]

    def wrapped(state, batch, *args):
        params = shard_params_tensor_parallel(state.params, mesh, model_axis)
        opt_leaves, opt_treedef = jax.tree_util.tree_flatten(state.opt_state)
        key = (
            jax.tree_util.tree_structure(state.params),
            opt_treedef,
            tuple(getattr(l, "shape", None) for l in opt_leaves),
        )
        shardings = cache.get(key)
        if shardings is None:
            shardings = cache[key] = _resolve_opt_shardings(
                state.params, state.opt_state
            )
        opt_state = opt_treedef.unflatten([
            leaf if s is None else jax.device_put(leaf, s)
            for leaf, s in zip(opt_leaves, shardings)
        ])
        state = state._replace(params=params, opt_state=opt_state)
        batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}
        args = tuple(
            jax.device_put(a, rep) if a is not None else None for a in args
        )
        return step_fn(state, batch, *args)

    return wrapped
