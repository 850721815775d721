"""Fully fused attention block: projections + linear attention + block tail.

Second-stage fusion on top of `ops/ffn_pallas.py` (the fused tail). The whole
:class:`~scream_tpu.models.attention.AttentionBlock` body — the reference's
MHAttention + FFN block (`/root/reference/models/transformer.py:47-90`) —
runs as TWO Pallas kernels instead of the ~10 XLA ops the flax composition
compiles to:

  * **stats** (grid ``(B, S/tile)``): per key/value row-tile, project
    ``kv = x_kv @ [Wk|Wv]`` on the MXU, apply the elu+1 feature map and the
    validity mask, and accumulate the linear-attention statistics
    ``KV = K'^T V`` (``(d, d)`` fp32, all heads as block-diagonal blocks) and
    ``K_sum`` in the output block across the sequence grid. Reads ``x_kv``
    ONCE; the projected K/V never exist in HBM.
  * **apply** (grid ``(B, L/tile)``): per query row-tile, project
    ``q = x_q @ Wq``, apply the feature map, contract against the
    (block-diagonal-masked) ``KV``, normalize by ``Q'.K_sum`` per head, and
    run the block tail (merge -> +x -> LN -> FFN -> +x -> LN) — all in VMEM.
    Reads ``x_q`` once, writes the block output once.

Why per-head contractions become full-``d`` dots: head_dim = d/num_heads is
32 at d_model=256 — sub-lane slices Mosaic handles poorly and tiny 32x32
MXU tiles. Instead ``K'^T V`` is computed at full ``(d, d)`` (the 8 diagonal
32x32 blocks are bit-identical to the per-head einsum; the off-diagonal
cross-head blocks are zeroed by a block-diagonal mask before the apply dot).
The extra FLOPs are MXU-cheap; the traffic they replace (materialized
projections, per-head layout copies ``bshd->bhdv``) is what the forward pass
is actually bound by (committed roofline `docs/roofline.json`: qkv_proj +
attn_einsums own 6.9 GB of ideal-fusion traffic, plus most of the 25%
XLA-over-ideal layout copies).

Numerics: matmul outputs round to the compute dtype exactly where the
unfused path rounds; the ``Q'.K_sum`` normalizer chain stays fp32 end-to-end
(thin ``(d, H)`` / ``(H, d)`` fp32 dots do the per-head reduce/broadcast).
One deliberate divergence: the apply contraction reads ``KV`` in the compute
dtype (the unfused einsum keeps it fp32), one extra bf16 rounding — measured
~2e-3 relative on block outputs, the same order as the bf16 activation
rounding the path already has (fp32 configs keep fp32 ``KV``: no divergence).

Backward: ``jax.custom_vjp`` whose bwd is the XLA vjp of the unfused body
(:func:`_block_xla` = the literal module composition) over the saved inputs —
projections/attention/hidden rematerialize in the backward,
``jax.checkpoint``-style, so training keeps the forward's traffic win.

Off-TPU the caller keeps the unfused flax path (`models/attention.py`).
Under a data-sharded mesh both kernels run per shard via a batch-dim
``custom_partitioning`` (`ops/partitioning.py`); only seq/model sharding
needs the unfused fallback, exactly as for the fused tail.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scream_tpu.ops.ffn_pallas import _ln, _tail_xla

_TILE_R = 256
# VMEM budget for auto-enable: weights (Wq+Wm+KV: 3*d*d, W1+W2: 2*d*hid, all
# compute dtype) + fp32 hidden tile + working activation tiles.
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _elu1(x):
    """``elu(x) + 1`` as ``where(x > 0, x + 1, exp(x))`` — Mosaic has no
    ``expm1`` lowering (jax.nn.elu uses it); adding 1 first is exact here
    because the result lives at scale 1 where ``exp`` is already
    well-conditioned (<=1 ulp from ``expm1(x) + 1``). Computed in fp32:
    Mosaic v5e rejects bf16 vector compares ("Target does not support this
    comparison"), and fp32 matches the unfused path's elu numerics anyway."""
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf + 1.0, jnp.exp(xf)).astype(x.dtype)


def fusable_block(d: int, hid: int, num_heads: int, dtype) -> bool:
    """Whether the fused attention-block kernels apply: MXU-aligned dims,
    clean head split, and the working set inside the VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (3 * d * d + 2 * d * hid) * itemsize + _TILE_R * hid * 4 \
        + 10 * _TILE_R * d * 4
    return (
        d % 128 == 0
        and hid % 128 == 0
        and d % num_heads == 0
        and vmem < _VMEM_BUDGET
    )


def _block_xla(xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2, g2, b2, *,
               num_heads, cd, nd, attn_eps, ln_eps):
    """Unfused reference body — the literal AttentionBlock composition
    (`models/attention.py`): separate projections, head split,
    :func:`linear_attention`, then the unfused tail. Used as the vjp body
    for the fused forward and as the parity oracle in tests."""
    from scream_tpu.models.attention import linear_attention

    B, L = xq.shape[0], xq.shape[1]
    S = xkv.shape[1]
    head_dim = Wq.shape[1] // num_heads
    mm = lambda x, W: x.astype(cd) @ W.astype(cd)
    q = mm(xq, Wq).reshape(B, L, num_heads, head_dim)
    k = mm(xkv, Wk).reshape(B, S, num_heads, head_dim)
    v = mm(xkv, Wv).reshape(B, S, num_heads, head_dim)
    message = linear_attention(q, k, v, qm, km, eps=attn_eps)
    return _tail_xla(message.reshape(B, L, Wq.shape[1]), xq, Wm, g1, b1,
                     W1, W2, g2, b2, cd=cd, nd=nd, eps=ln_eps)


def _stats_kernel(x_ref, m_ref, wkv_ref, kv_ref, ksum_ref, *, d, prec, cd):
    """Accumulate KV = K'^T V (full (d, d), fp32) and K_sum over the S grid."""
    x = x_ref[0]                      # (T, d) compute dtype
    m = m_ref[0]                      # (T, 1) fp32 validity
    kv = jax.lax.dot_general(
        x, wkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(cd)                      # (T, 2d)
    k = kv[:, :d]
    v = kv[:, d:]
    mc = m.astype(cd)
    kp = _elu1(k) * mc
    vm = v * mc
    contrib = jax.lax.dot_general(    # K'^T V: contract the row (T) dim
        kp, vm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )                                 # (d, d) fp32
    ksum = jnp.sum(kp.astype(jnp.float32), axis=0, keepdims=True)  # (1, d)

    @pl.when(pl.program_id(1) == 0)
    def _():
        kv_ref[0] = contrib
        ksum_ref[0] = ksum

    @pl.when(pl.program_id(1) != 0)
    def _():
        kv_ref[0] += contrib
        ksum_ref[0] += ksum


def _apply_kernel(x_ref, m_ref, wq_ref, kvm_ref, kvlo_ref, ksum_ref,
                  hsel_ref, hexp_ref, wm_ref, g1_ref, b1_ref, w1_ref, w2_ref,
                  g2_ref, b2_ref, o_ref, *, prec, cd, nd, attn_eps, ln_eps,
                  split_kv):
    """Project q, contract against the masked KV, normalize per head, then
    the block tail — one VMEM pass per query row-tile."""
    dot = partial(jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32, precision=prec)
    x = x_ref[0]                      # (T, d) block input rows
    m = m_ref[0]                      # (T, 1) fp32
    q = dot(x, wq_ref[...]).astype(cd)
    qp = _elu1(q) * m.astype(cd)               # (T, d)
    att = dot(qp, kvm_ref[0])                        # (T, d) fp32
    if split_kv:
        # The fp32 KV is carried as bf16 hi + bf16 residual: two MXU dots
        # recover the unfused einsum's fp32-operand precision (the single
        # bf16 cast costs ~3e-2 max relative on block outputs; this brings
        # it to the path's ordinary bf16 activation rounding, ~2e-3).
        att = att + dot(qp, kvlo_ref[0])
    # Per-head normalizer, fp32 end-to-end: z_h = sum_{c in head h} Q'_c K_sum_c.
    t = qp.astype(jnp.float32) * ksum_ref[0]          # (T, d)
    z = jax.lax.dot_general(t, hsel_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (T, H)
    zinv = 1.0 / (z + attn_eps)
    zfull = jax.lax.dot_general(zinv, hexp_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)  # (T, d)
    msg = (att * zfull).astype(cd)
    # Block tail (same op sequence as ffn_pallas._tail_kernel).
    mrg = dot(msg, wm_ref[...]).astype(cd)
    t1 = mrg + x
    y = _ln(t1, g1_ref[...], b1_ref[...], ln_eps, nd).astype(cd)
    h = jnp.maximum(dot(y, w1_ref[...]).astype(cd), 0)
    f = dot(h, w2_ref[...]).astype(cd)
    u = x + f
    o_ref[0] = _ln(u, g2_ref[...], b2_ref[...], ln_eps, nd).astype(cd)


def _pad_rows(x, mask, tile):
    """Pad the sequence dim to a tile multiple; mask pads with 0 (fp32,
    shaped (B, Sp, 1) for clean row-wise broadcast in the kernels)."""
    B, S = x.shape[0], x.shape[1]
    Sp = _round_up(S, tile)
    mf = mask.astype(jnp.float32).reshape(B, S, 1)
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        mf = jnp.pad(mf, ((0, 0), (0, Sp - S), (0, 0)))
    return x, mf, Sp


def _attention_block_pallas(xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2,
                            g2, b2, *, num_heads, cd, nd, attn_eps, ln_eps,
                            interpret):
    B, L, d = xq.shape
    hid = W1.shape[1]
    H = num_heads
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)
    f32 = jnp.float32

    xq2, qmf, Lp = _pad_rows(xq.astype(cd), qm, _TILE_R)
    xkv2, kmf, Sp = _pad_rows(xkv.astype(cd), km, _TILE_R)
    Wkv = jnp.concatenate([Wk, Wv], axis=1).astype(cd)  # (d, 2d)

    row3 = lambda b, i: (b, i, 0)
    head = lambda b, i: (b, 0, 0)
    const = lambda b, i: (0, 0)
    vec = lambda shape: pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)
    itemsize = jnp.dtype(cd).itemsize

    KV, Ksum = pl.pallas_call(
        partial(_stats_kernel, d=d, prec=prec, cd=cd),
        grid=(B, Sp // _TILE_R),
        in_specs=[
            pl.BlockSpec((1, _TILE_R, d), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_R, 1), row3, memory_space=pltpu.VMEM),
            vec((d, 2 * d)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, d), head, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), head, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d, d), f32),
            jax.ShapeDtypeStruct((B, 1, d), f32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Sp * d * 3 * d,
            bytes_accessed=(B * Sp * d + 2 * d * d) * itemsize
            + B * (d * d + d) * 4,
            transcendentals=B * Sp * d,  # elu's expm1 on the negative side
        ),
    )(xkv2, kmf, Wkv)

    # Zero the cross-head blocks (the full-d contraction computes them; the
    # per-head attention never uses them) and pre-cast for the apply dot.
    hd = d // H
    hid_of = jnp.arange(d) // hd
    blockdiag = (hid_of[:, None] == hid_of[None, :])
    KVf = jnp.where(blockdiag[None], KV, 0.0)
    KVm = KVf.astype(cd)
    split_kv = cd != f32
    # bf16 residual of the fp32 KV (zeros for fp32 configs — skipped).
    KVlo = (KVf - KVm.astype(f32)).astype(cd) if split_kv else KVm
    # Thin fp32 selectors: per-head reduce (d, H) and broadcast-back (H, d).
    hsel = (hid_of[:, None] == jnp.arange(H)[None, :]).astype(f32)
    hexp = hsel.T

    out = pl.pallas_call(
        partial(_apply_kernel, prec=prec, cd=cd, nd=nd,
                attn_eps=attn_eps, ln_eps=ln_eps, split_kv=split_kv),
        grid=(B, Lp // _TILE_R),
        in_specs=[
            pl.BlockSpec((1, _TILE_R, d), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_R, 1), row3, memory_space=pltpu.VMEM),
            vec((d, d)),          # Wq
            pl.BlockSpec((1, d, d), head, memory_space=pltpu.VMEM),   # KVm
            pl.BlockSpec((1, d, d), head, memory_space=pltpu.VMEM),   # KVlo
            pl.BlockSpec((1, 1, d), head, memory_space=pltpu.VMEM),   # Ksum
            vec((d, H)),          # hsel
            vec((H, d)),          # hexp
            vec((d, d)),          # Wm
            vec((1, d)),          # g1
            vec((1, d)),          # b1
            vec((d, hid)),        # W1
            vec((hid, d)),        # W2
            vec((1, d)),          # g2
            vec((1, d)),          # b2
        ],
        out_specs=pl.BlockSpec((1, _TILE_R, d), row3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, d), cd),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * d * (3 * d + 2 * hid),
            bytes_accessed=2 * B * Lp * d * itemsize
            + (2 * d * d + 2 * d * hid) * itemsize + B * d * d * itemsize,
            transcendentals=B * Lp * (d + 2),  # elu + two LN rsqrts per row
        ),
    )(xq2, qmf, Wq.astype(cd), KVm, KVlo, Ksum, hsel, hexp, Wm.astype(cd),
      g1.reshape(1, d).astype(f32), b1.reshape(1, d).astype(f32),
      W1.astype(cd), W2.astype(cd),
      g2.reshape(1, d).astype(f32), b2.reshape(1, d).astype(f32))
    if Lp != L:
        out = out[:, :L]
    return out


@lru_cache(maxsize=None)
def _make_attention_block(num_heads: int, cd_name: str, nd_name: str,
                          attn_eps: float, ln_eps: float, fused: bool,
                          interpret: bool):
    cd, nd = jnp.dtype(cd_name), jnp.dtype(nd_name)
    kw = dict(num_heads=num_heads, cd=cd, nd=nd, attn_eps=attn_eps,
              ln_eps=ln_eps)

    if not fused:
        return partial(_block_xla, **kw)

    impl = partial(_attention_block_pallas, interpret=interpret, **kw)
    # Batch-dim SPMD partitioning (see ops/partitioning.py): under a
    # data-sharded mesh both kernels run per-shard instead of forcing the
    # unfused fallback; inside shard_map the raw impl is used.
    from scream_tpu.ops.partitioning import batch_partitioned

    impl_sp = batch_partitioned(
        impl,
        operand_mappings=(
            ("b", "l", "d"), ("b", "s", "dk"), ("b", "l"), ("b", "s"),
            ("wq1", "wq2"), ("wk1", "wk2"), ("wv1", "wv2"), ("wm1", "wm2"),
            ("g1",), ("b1",), ("w11", "w12"), ("w21", "w22"),
            ("g2",), ("b2",),
        ),
        result_mapping=("b", "l", "d"),
        batch_operands=(0, 1, 2, 3),
    )

    @jax.custom_vjp
    def blk(xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2, g2, b2):
        return impl_sp(xq, xkv, qm, km, Wq, Wk, Wv, Wm, g1, b1, W1, W2, g2,
                       b2)

    def blk_fwd(*args):
        return impl_sp(*args), args

    def blk_bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _block_xla(*a, **kw), *res)
        return vjp(g.astype(cd))

    blk.defvjp(blk_fwd, blk_bwd)
    return blk


def attention_block(xq, xkv, q_mask, kv_mask, Wq, Wk, Wv, Wm, g1, b1, W1, W2,
                    g2, b2, *, num_heads, dtype, norm_dtype,
                    attn_eps: float = 1e-6, ln_eps: float = 1e-5,
                    use_pallas=None, interpret: bool = False):
    """Fused attention block ``LN2(x + FFN(LN1(attn(x_q, x_kv) @ Wm + x)))``.

    Args:
      xq: ``(B, L, d)`` block input (query source AND both residual adds —
        the reference's double q-residual).
      xkv: ``(B, S, d)`` key/value source (``xq`` itself for self-attention).
      q_mask / kv_mask: ``(B, L)`` / ``(B, S)`` bool validity (None = all
        valid).
      use_pallas: True = fused kernels, False = unfused XLA body, None =
        auto (fused iff the default backend is TPU and the shape passes
        :func:`fusable_block`).

    Returns ``(B, L, d)`` in ``dtype``.
    """
    cd = jnp.dtype(dtype)
    d, hid = Wq.shape[0], W1.shape[1]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and fusable_block(d, hid, num_heads, cd))
    if q_mask is None:
        q_mask = jnp.ones(xq.shape[:2], dtype=bool)
    if kv_mask is None:
        kv_mask = jnp.ones(xkv.shape[:2], dtype=bool)
    fn = _make_attention_block(num_heads, cd.name, jnp.dtype(norm_dtype).name,
                               float(attn_eps), float(ln_eps),
                               bool(use_pallas), bool(interpret))
    return fn(xq, xkv, q_mask, kv_mask, Wq, Wk, Wv, Wm, g1, b1, W1, W2,
              g2, b2)
