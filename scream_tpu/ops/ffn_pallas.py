"""Fused attention-block tail: merge -> +q -> LN -> FFN(relu) -> +q -> LN.

The tail of every attention block (reference
`/root/reference/models/transformer.py:74-90`: ``norm1(merge(att)+q)`` ->
``mlp`` -> ``norm2(q+mlp)``) is five separate modules in torch and, compiled
naively, five XLA ops. XLA cannot fuse across the two FFN matmuls, so the
unfused graph spills the ``(rows, ffn_mult*d)`` hidden plus both LayerNorm
operands to HBM — at the headline shape (B=16, N=4096, d=256, bf16) that is
~400 MB of round-trip traffic per block, and the forward pass is memory-bound
(committed roofline: ``docs/roofline.json`` — AI 114 FLOP/B vs the v5e
critical 240, LN+FFN = 14.7 GB of the 22.6 GB ideal-fusion traffic).

This kernel runs the whole tail per row-tile in VMEM: it reads the attention
output and the block input once from HBM and writes the block output once;
the three matmuls (merge d×d, ffn_in d×4d, ffn_out 4d×d) hit the MXU with
fp32 accumulation and the hidden never leaves the chip. Weights stream once
(constant index_map -> Mosaic keeps them resident across the row grid).

Numerics mirror the unfused path cast-for-cast: matmul outputs round to the
compute dtype exactly where ``nn.Dense(dtype=...)`` rounds, and LayerNorm
reproduces ``flax.linen.LayerNorm``'s math op-for-op (fp32 fast-variance
stats clipped at zero, ``(x-mu) * (rsqrt(var+eps) * scale) + bias``,
epsilon 1e-5 for torch parity).

Backward: ``jax.custom_vjp`` whose bwd is the XLA vjp of the (identical)
unfused body over the saved primals — i.e. the hidden is rematerialized in
the backward, ``jax.checkpoint``-style, so training keeps the forward's
traffic win at the cost of recomputing one FFN.

Off-TPU callers take ``use_pallas=False`` and get the plain XLA body with
flax's native autodiff — byte-identical behavior to the pre-fusion module
composition. Under a data-sharded mesh the kernel runs per shard via a
batch-dim ``custom_partitioning`` (`ops/partitioning.py`); only seq/model
sharding needs the unfused fallback.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-grid-step row tile. 256 rows x d lanes: full MXU occupancy for the
# three matmuls at d>=128 while keeping the fp32 hidden tile (256 x 4d)
# comfortably inside VMEM up to d=512.
_TILE_R = 256
# VMEM budget guard for auto-enable (weights both-dtypes + hidden tile +
# activation tiles, double-buffered); ~16 MB/core physical.
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ln(t, g, b, eps: float, norm_dtype):
    """``flax.linen.LayerNorm`` math, op-for-op (normalization.py
    ``_compute_stats``/``_normalize`` with the default
    force_float32_reductions + use_fast_variance): fp32 stats,
    ``var = max(0, E[x^2] - E[x]^2)``, scale folded into the rsqrt
    multiplier, output cast to ``norm_dtype``."""
    xf = t.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
    y = (xf - mu) * mul + b.astype(jnp.float32)
    return y.astype(norm_dtype)


def _tail_xla(x, q, Wm, g1, b1, W1, W2, g2, b2, *, cd, nd, eps):
    """Unfused reference body — the exact op sequence the flax module
    composition (Dense/LayerNorm/Dense/relu/Dense/LayerNorm) compiles to.
    Used as the off-TPU path and as the vjp body for the fused forward."""
    m = x.astype(cd) @ Wm.astype(cd)
    t = m + q.astype(cd)
    y = _ln(t, g1, b1, eps, nd).astype(cd)
    h = jnp.maximum(y @ W1.astype(cd), 0)
    f = h @ W2.astype(cd)
    u = q.astype(cd) + f
    return _ln(u, g2, b2, eps, nd).astype(cd)


def _tail_kernel(x_ref, q_ref, wm_ref, g1_ref, b1_ref, w1_ref, w2_ref,
                 g2_ref, b2_ref, o_ref, *, eps, cd, nd):
    # The package sets jax_default_matmul_precision="highest" globally (for
    # the fp32 geometry core); Mosaic rejects bf16 operands under an fp32
    # contract_precision ("Bad lhs type"). Pin the precision per dot:
    # bf16 inputs accumulate in fp32 on the MXU regardless (DEFAULT is
    # exact), fp32 inputs keep HIGHEST to match the unfused path.
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=prec)
    m = dot(x_ref[:], wm_ref[:]).astype(cd)
    t = m + q_ref[:]
    y = _ln(t, g1_ref[:], b1_ref[:], eps, nd).astype(cd)
    h = jnp.maximum(dot(y, w1_ref[:]).astype(cd), 0)
    f = dot(h, w2_ref[:]).astype(cd)
    u = q_ref[:] + f
    o_ref[:] = _ln(u, g2_ref[:], b2_ref[:], eps, nd).astype(cd)


def _tail_pallas(x, q, Wm, g1, b1, W1, W2, g2, b2, *, cd, nd, eps,
                 interpret):
    B, L, d = x.shape
    hid = W1.shape[1]
    R = B * L
    Rp = _round_up(R, _TILE_R)
    x2 = x.reshape(R, d).astype(cd)
    q2 = q.reshape(R, d).astype(cd)
    if Rp != R:
        # Zero rows normalize to rsqrt(eps)*0 + bias — finite, then dropped.
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
        q2 = jnp.pad(q2, ((0, Rp - R), (0, 0)))
    # Cast weights OUTSIDE the kernel so the HBM->VMEM stream is already in
    # the compute dtype (halves weight traffic under bf16).
    Wm_c, W1_c, W2_c = Wm.astype(cd), W1.astype(cd), W2.astype(cd)
    f32 = jnp.float32
    g1r, b1r = g1.reshape(1, d).astype(f32), b1.reshape(1, d).astype(f32)
    g2r, b2r = g2.reshape(1, d).astype(f32), b2.reshape(1, d).astype(f32)

    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    vec = lambda shape: pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)
    itemsize = jnp.dtype(cd).itemsize
    out = pl.pallas_call(
        partial(_tail_kernel, eps=eps, cd=cd, nd=nd),
        grid=(Rp // _TILE_R,),
        in_specs=[
            pl.BlockSpec((_TILE_R, d), row, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((_TILE_R, d), row, memory_space=pltpu.VMEM),  # q
            vec((d, d)),      # Wm
            vec((1, d)),      # g1
            vec((1, d)),      # b1
            vec((d, hid)),    # W1
            vec((hid, d)),    # W2
            vec((1, d)),      # g2
            vec((1, d)),      # b2
        ],
        out_specs=pl.BlockSpec((_TILE_R, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, d), cd),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * d * (d + 2 * hid),
            bytes_accessed=(3 * Rp * d + d * d + 2 * d * hid) * itemsize,
            transcendentals=2 * Rp,  # two rsqrts per row
        ),
    )(x2, q2, Wm_c, g1r, b1r, W1_c, W2_c, g2r, b2r)
    if Rp != R:
        out = out[:R]
    return out.reshape(B, L, d)


@lru_cache(maxsize=None)
def _make_block_tail(cd_name: str, nd_name: str, eps: float, fused: bool,
                     interpret: bool):
    cd, nd = jnp.dtype(cd_name), jnp.dtype(nd_name)
    kw = dict(cd=cd, nd=nd, eps=eps)

    if not fused:
        # Plain XLA body under flax's native autodiff — no custom_vjp, no
        # residual rematerialization: exactly the pre-fusion behavior.
        return partial(_tail_xla, **kw)

    impl = partial(_tail_pallas, interpret=interpret, **kw)
    # Batch-dim SPMD partitioning (see ops/partitioning.py): under a
    # data-sharded mesh the kernel runs per-shard instead of forcing the
    # unfused fallback; inside shard_map the raw impl is used.
    from scream_tpu.ops.partitioning import batch_partitioned

    impl_sp = batch_partitioned(
        impl,
        operand_mappings=(
            ("b", "l", "d"), ("b", "l", "d"), ("wm1", "wm2"),
            ("g1",), ("b1",), ("w11", "w12"), ("w21", "w22"),
            ("g2",), ("b2",),
        ),
        result_mapping=("b", "l", "d"),
        batch_operands=(0, 1),
    )

    @jax.custom_vjp
    def tail(x, q, Wm, g1, b1, W1, W2, g2, b2):
        return impl_sp(x, q, Wm, g1, b1, W1, W2, g2, b2)

    def tail_fwd(*args):
        return impl_sp(*args), args

    def tail_bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _tail_xla(*a, **kw), *res)
        return vjp(g.astype(cd))

    tail.defvjp(tail_fwd, tail_bwd)
    return tail


def fusable(d: int, hid: int, dtype) -> bool:
    """Whether the fused kernel applies: MXU-aligned dims and the weight +
    hidden tiles fit the VMEM budget (d<=512 at ffn_mult=4)."""
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (d * d + 2 * d * hid) * itemsize + _TILE_R * hid * 4 \
        + 6 * _TILE_R * d * itemsize
    return d % 128 == 0 and hid % 128 == 0 and vmem < _VMEM_BUDGET


def block_tail(x, q, Wm, g1, b1, W1, W2, g2, b2, *, dtype, norm_dtype,
               eps: float = 1e-5, use_pallas=None, interpret: bool = False):
    """Attention-block tail ``LN2(q + FFN(LN1(x @ Wm + q)))``.

    Args:
      x: ``(B, L, d)`` attention output (pre-merge-projection).
      q: ``(B, L, d)`` block input (both residuals add it — the reference's
        double q-residual, `/root/reference/models/transformer.py:84-90`).
      Wm / W1 / W2: merge ``(d,d)``, ffn_in ``(d,hid)``, ffn_out ``(hid,d)``
        kernels (fp32 params, cast to ``dtype`` for compute).
      g1, b1 / g2, b2: LayerNorm scale/bias for norm1 / norm2.
      use_pallas: True = fused Pallas kernel, False = unfused XLA body,
        None = auto (fused iff the default backend is TPU and the shape
        passes :func:`fusable`). Batch-dim-sharded meshes keep the kernel
        (per-shard via custom_partitioning); pass False for seq/model
        sharding.
      interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns ``(B, L, d)`` in ``dtype``.
    """
    cd = jnp.dtype(dtype)
    d, hid = Wm.shape[0], W1.shape[1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and fusable(d, hid, cd)
    fn = _make_block_tail(cd.name, jnp.dtype(norm_dtype).name, float(eps),
                          bool(use_pallas), bool(interpret))
    return fn(x, q, Wm, g1, b1, W1, W2, g2, b2)
