"""Linear attention blocks and continuous sinusoidal position embedding.

TPU-native re-design of `/root/reference/models/transformer.py`:

  * :func:`linear_attention` — the O(N) "Transformers are RNNs" attention
    (reference `models/transformer.py:11-44`). It is an einsum chain XLA maps
    straight onto the MXU; the KV contraction accumulates in fp32 even under
    bf16 compute, replacing the reference's fp16 value-scaling trick.
  * :class:`AttentionBlock` — pre-projection MHA block with the reference's
    idiosyncratic double q-residual (`models/transformer.py:74-90`: both
    ``norm1(merge(att)+q)`` and ``norm2(q+mlp(...))`` add the *block input*).
  * :func:`sinusoidal_pe` — continuous n-dim coordinate embedding
    (`models/transformer.py:135-179`).

Everything is batched ``(B, N, D)`` with boolean validity masks; the reference
is batch-size-1 only (`models/pointnet.py:39-40`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_pe(
    xyz: jnp.ndarray,
    d_model: int,
    n_dim: int = 3,
    temperature: float = 10000.0,
    scale: float = 2.0 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Continuous sinusoidal PE for coordinates ``(..., n_dim)`` -> ``(..., d_model)``.

    Bit-identical math to `/root/reference/models/transformer.py:157-179`:
    per input dimension ``num_pos_feats = d_model // n_dim // 2 * 2`` channels
    with frequencies ``temperature**(2*(i//2)/num_pos_feats)``, even channels
    sin, odd channels cos, remainder zero-padded.
    """
    num_pos_feats = d_model // n_dim // 2 * 2
    padding = d_model - num_pos_feats * n_dim

    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)

    pos = xyz.astype(jnp.float32) * scale
    pos_divided = pos[..., None] / dim_t  # (..., n_dim, num_pos_feats)
    pos_sin = jnp.sin(pos_divided[..., 0::2])
    pos_cos = jnp.cos(pos_divided[..., 1::2])
    pe = jnp.stack([pos_sin, pos_cos], axis=-1).reshape(xyz.shape[:-1] + (-1,))
    if padding:
        pe = jnp.pad(pe, [(0, 0)] * (pe.ndim - 1) + [(0, padding)])
    return pe.astype(dtype)


def linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    kv_reduce=None,
) -> jnp.ndarray:
    """O(N) linear attention with the elu+1 feature map.

    Args:
      q: ``(B, L, H, D)`` queries; k/v: ``(B, S, H, D)`` keys/values.
      q_mask / kv_mask: ``(B, L)`` / ``(B, S)`` validity masks.
      kv_reduce: optional hook applied to the ``(KV, K_sum)`` pair after the
        contractions — the sequence-parallel path passes a ``psum`` over the
        mesh's seq axis here (``scream_tpu/parallel/sp.py``) so both paths
        share one body and stay numerically identical by construction.

    Same contraction order as the reference (`models/transformer.py:28-44`):
    ``KV = K^T V`` then ``out = Q KV / (Q . sum(K))``. The reference divides v
    by S and multiplies back after to dodge fp16 overflow; here the two
    contractions simply accumulate in fp32 (free on the MXU), which is both
    faster and more accurate under bf16.
    """
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)

    # (B, H, D, Dv) — tiny: H * D * Dv, independent of sequence length.
    KV = jnp.einsum("bshd,bshv->bhdv", K, v, preferred_element_type=jnp.float32)
    K_sum = jnp.sum(K.astype(jnp.float32), axis=1)  # (B, H, D)
    if kv_reduce is not None:
        KV, K_sum = kv_reduce((KV, K_sum))
    Z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q, K_sum, preferred_element_type=jnp.float32) + eps)
    out = jnp.einsum("blhd,bhdv->blhv", Q, KV, preferred_element_type=jnp.float32)
    out = out * Z[..., None]
    return out.astype(q.dtype)


class _ProjKernel(nn.Module):
    """Bare ``(in, out)`` matmul kernel with the same ``{name: {"kernel": W}}``
    param layout as ``nn.Dense(use_bias=False)`` — so checkpoints, the
    ``.pth`` converter and the TP column/row specs are all unchanged — but
    returning the raw weight so q/k/v projections can be fused into one
    matmul at apply time (see :class:`AttentionBlock`)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (in_features, self.features), jnp.float32,
        )


class _NormParams(nn.Module):
    """LayerNorm scale/bias with the same ``{name: {"scale", "bias"}}``
    param layout (fp32, ones/zeros init) as ``nn.LayerNorm`` — the raw
    params feed the fused block-tail kernel (`ops/ffn_pallas.py`), whose
    XLA fallback reproduces flax's LayerNorm math op-for-op."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return g, b


class AttentionBlock(nn.Module):
    """MHA block: q/k/v projections -> linear attention -> merge -> FFN.

    Residual wiring is deliberately faithful to the reference
    (`models/transformer.py:74-90`): both norms add the block *input* q,
    not the intermediate message. LayerNorm epsilon is 1e-5, torch's
    default, for numerical parity (flax defaults to 1e-6).

    The q/k/v projections fuse into a single matmul whenever the inputs are
    the same traced array (self-attention: one ``(d, 3d)`` matmul; cross
    attention with shared k/v input: q alone + one ``(d, 2d)``). The fused
    form reads the activation operand — the large one — from HBM once
    instead of three times; concatenating the kernels costs one tiny
    ``(d, 3d)`` copy. Same math per output element, so it is numerically
    identical to three separate Dense calls.

    The block tail (merge -> +q -> LN -> FFN -> +q -> LN) runs as one fused
    Pallas kernel on TPU (``fused_tail``, see `ops/ffn_pallas.py`): the FFN
    hidden and both LayerNorm operands stay in VMEM instead of round-tripping
    HBM. ``fused_tail=None`` auto-selects by backend and shape; batch-sharded
    meshes keep the kernel per shard (`ops/partitioning.py`) — pass False
    for seq/model-sharded applies, where the fallback is the identical
    unfused XLA graph.
    """

    d_model: int
    num_heads: int = 8
    ffn_mult: int = 4
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    fused_tail: Optional[bool] = None
    fused_attn: Optional[bool] = None

    @nn.compact
    def __call__(self, q, k, v, q_mask=None, kv_mask=None):
        head_dim = self.d_model // self.num_heads
        B, L = q.shape[0], q.shape[1]
        S = k.shape[1]

        # Params always exist under q_proj/k_proj/v_proj regardless of which
        # fusion the call pattern selects (flax requires unconditional
        # module creation; tracer identity is a trace-time constant).
        Wq = _ProjKernel(self.d_model, name="q_proj")(q.shape[-1])
        Wk = _ProjKernel(self.d_model, name="k_proj")(k.shape[-1])
        Wv = _ProjKernel(self.d_model, name="v_proj")(v.shape[-1])
        Wm = _ProjKernel(self.d_model, name="merge")(self.d_model)
        g1, b1 = _NormParams(self.d_model, name="norm1")()
        W1 = _ProjKernel(self.d_model * self.ffn_mult,
                         name="ffn_in")(self.d_model)
        W2 = _ProjKernel(self.d_model,
                         name="ffn_out")(self.d_model * self.ffn_mult)
        g2, b2 = _NormParams(self.d_model, name="norm2")()
        mm = lambda x, W: x.astype(self.dtype) @ W.astype(self.dtype)

        # Whole-block fusion (ops/attn_pallas.py): projections + linear
        # attention + the tail in two Pallas kernels. Applies when k and v
        # are the same traced array (self-attention, or cross attention with
        # a shared k/v source — every call site in this package), which is
        # what the fused stats kernel projects from. The branch is a
        # trace-time constant, so init/apply see one consistent param tree.
        from scream_tpu.ops import attn_pallas

        use_fused_attn = self.fused_attn
        if use_fused_attn is None:
            import jax as _jax

            use_fused_attn = (
                _jax.default_backend() == "tpu"
                and attn_pallas.fusable_block(
                    self.d_model, self.d_model * self.ffn_mult,
                    self.num_heads, self.dtype)
            )
        if use_fused_attn and (v is k) and q.shape[-1] == self.d_model \
                and k.shape[-1] == self.d_model:
            return attn_pallas.attention_block(
                q, k, q_mask, kv_mask, Wq, Wk, Wv, Wm, g1, b1, W1, W2,
                g2, b2, num_heads=self.num_heads, dtype=self.dtype,
                norm_dtype=self.norm_dtype, use_pallas=self.fused_attn,
            )
        if (k is q) and (v is q):
            qkv = mm(q, jnp.concatenate([Wq, Wk, Wv], axis=1))
            query, key, value = jnp.split(qkv, 3, axis=-1)
        elif v is k:
            query = mm(q, Wq)
            key, value = jnp.split(mm(k, jnp.concatenate([Wk, Wv], axis=1)),
                                   2, axis=-1)
        else:
            query, key, value = mm(q, Wq), mm(k, Wk), mm(v, Wv)
        query = query.reshape(B, L, self.num_heads, head_dim)
        key = key.reshape(B, S, self.num_heads, head_dim)
        value = value.reshape(B, S, self.num_heads, head_dim)

        message = linear_attention(query, key, value, q_mask, kv_mask)

        # Block tail as raw params + one call (fused Pallas kernel on TPU,
        # the identical unfused XLA body elsewhere). Param names/shapes are
        # exactly the old nn.Dense/nn.LayerNorm layout, so checkpoints, the
        # .pth converter and the TP column/row specs are unchanged. Norms
        # default to fp32 stats for numerical stability under bf16 compute.
        from scream_tpu.ops.ffn_pallas import block_tail

        return block_tail(
            message.reshape(B, L, self.d_model), q, Wm, g1, b1, W1, W2,
            g2, b2, dtype=self.dtype, norm_dtype=self.norm_dtype,
            use_pallas=self.fused_tail,
        )
