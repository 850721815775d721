"""Expert parallelism: a mixture-of-experts FFN with experts sharded over chips.

The reference model family has no MoE (a dense ~10M-param transformer,
SURVEY.md §2.1); this is the framework's capability layer for scaling the FFN
width: the expert dimension of the weight stacks shards over an ``expert``
mesh axis, every chip runs only its local experts, and the routed outputs
combine with one psum over ICI.

Dispatch is the dense-masked (Mesh-TensorFlow-style einsum) variant: each
chip evaluates its experts on all tokens and the routing weights zero the
tokens not assigned to them. For the point-cloud workloads here (N ≤ ~20k
tokens, a handful of experts) this is MXU-friendly — big static matmuls, no
dynamic shapes — and the communication is a single all-reduce; a
capacity-bucketed all_to_all dispatch only pays off at much larger expert
counts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_expert_mesh(n_experts_shards: int, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D ``(expert,)`` mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_experts_shards:
        raise ValueError(
            f"expert mesh needs {n_experts_shards} devices, got {len(devices)}"
        )
    return Mesh(np.asarray(devices[:n_experts_shards]), ("expert",))


def init_moe_ffn_params(rng, d_model: int, d_hidden: int, n_experts: int):
    """Xavier-initialized MoE FFN weights: gate (d, E), w_in (E, d, f),
    w_out (E, f, d)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        "gate": xavier(k1, (d_model, n_experts), jnp.float32),
        "w_in": xavier(k2, (n_experts, d_model, d_hidden), jnp.float32),
        "w_out": xavier(k3, (n_experts, d_hidden, d_model), jnp.float32),
    }


def moe_ffn_reference(params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-device top-1 MoE FFN: the correctness oracle for the EP path.

    ``x``: (B, L, d). Softmax gate, top-1 routing, relu FFN per expert,
    output scaled by the winning gate probability.
    """
    probs = jax.nn.softmax(x @ params["gate"], axis=-1)  # (B, L, E)
    top = jnp.argmax(probs, axis=-1)  # (B, L)
    weight = jnp.take_along_axis(probs, top[..., None], axis=-1)  # (B, L, 1)
    h = jax.nn.relu(jnp.einsum("bld,edf->belf", x, params["w_in"]))
    y = jnp.einsum("belf,efd->beld", h, params["w_out"])  # (B, E, L, d)
    onehot = jax.nn.one_hot(top, probs.shape[-1], dtype=x.dtype)  # (B, L, E)
    return jnp.einsum("beld,ble->bld", y, onehot) * weight


def expert_parallel_moe_ffn(
    mesh: Mesh,
    params,
    x: jnp.ndarray,
    axis: str = "expert",
) -> jnp.ndarray:
    """Top-1 MoE FFN with the expert stacks sharded over ``axis``.

    Numerically identical to :func:`moe_ffn_reference` (tested on the virtual
    CPU mesh). Per-chip work: gate (replicated, tiny) + its ``E/n`` experts'
    FFN over all tokens; communication: one psum of the (B, L, d) output.
    ``n_experts`` must divide over the axis size.
    """
    n_shards = mesh.shape[axis]
    n_experts = params["w_in"].shape[0]
    assert n_experts % n_shards == 0, (
        f"{n_experts} experts not divisible over {n_shards} expert shards"
    )
    e_loc = n_experts // n_shards

    def body(gate, w_in, w_out, x):
        probs = jax.nn.softmax(x @ gate, axis=-1)  # (B, L, E) global gate
        top = jnp.argmax(probs, axis=-1)  # (B, L)
        weight = jnp.take_along_axis(probs, top[..., None], axis=-1)
        shard = jax.lax.axis_index(axis)
        # Global ids of this chip's experts; route tokens whose winner is local.
        local_ids = shard * e_loc + jnp.arange(e_loc)
        onehot_local = (top[..., None] == local_ids).astype(x.dtype)  # (B, L, e_loc)
        h = jax.nn.relu(jnp.einsum("bld,edf->belf", x, w_in))
        y = jnp.einsum("belf,efd->beld", h, w_out)  # (B, e_loc, L, d)
        out_local = jnp.einsum("beld,ble->bld", y, onehot_local) * weight
        return jax.lax.psum(out_local, axis)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params["gate"], params["w_in"], params["w_out"], x)
