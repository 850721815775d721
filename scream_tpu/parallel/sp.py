"""Sequence parallelism: linear attention with points sharded across chips.

The reference's "long-context" story is linear attention + voxel downsampling
at batch 1 (SURVEY.md §5); it has no distributed path. Here the linear
attention contraction shards the *sequence* (point) dimension over the mesh:

    KV_local = K_shard^T V_shard      (per-chip partial, tiny: H x D x Dv)
    KV       = psum(KV_local, "seq")   (one ICI all-reduce of ~d_model^2)
    out      = Q_shard @ KV            (queries stay sharded; no gather)

So a cloud larger than one chip's HBM costs exactly one psum of a
sequence-length-independent matrix per attention layer — the
embarrassingly-friendly case of sequence parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _local_linear_attention(q, k, v, q_mask, kv_mask, eps, axis_name):
    """Per-shard body; q/k/v are the local sequence shards ``(B, n_loc, H, D)``.

    One source of truth with the single-device path: this is exactly
    :func:`scream_tpu.models.attention.linear_attention` with the
    ``(KV, K_sum)`` pair psum-reduced over the seq axis — the only
    communication, two tiny sequence-independent reductions (fused into one
    psum of a pytree by XLA).
    """
    from scream_tpu.models.attention import linear_attention

    return linear_attention(
        q, k, v, q_mask=q_mask, kv_mask=kv_mask, eps=eps,
        kv_reduce=lambda kv: jax.lax.psum(kv, axis_name),
    )


def sequence_parallel_linear_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Linear attention with q/k/v sharded on their sequence dimension.

    Numerically identical to :func:`scream_tpu.models.attention.linear_attention`
    (tested on the virtual CPU mesh); sequence lengths must divide the ``seq``
    axis size.
    """
    has_qm, has_km = q_mask is not None, kv_mask is not None

    def body(q, k, v, qm, km):
        return _local_linear_attention(
            q, k, v, qm if has_qm else None, km if has_km else None, eps, axis_name
        )

    spec_seq = P(None, axis_name, None, None)
    spec_mask = P(None, axis_name)
    if not has_qm:
        q_mask = jnp.ones(q.shape[:2], dtype=bool)
    if not has_km:
        kv_mask = jnp.ones(k.shape[:2], dtype=bool)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_seq, spec_seq, spec_seq, spec_mask, spec_mask),
        out_specs=spec_seq,
    )
    return fn(q, k, v, q_mask, kv_mask)
