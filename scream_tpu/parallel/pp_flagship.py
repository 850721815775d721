"""Pipeline parallelism for the flagship PointTransformer.

`parallel/pp.py` pipelines HOMOGENEOUS stacks (stage_fn must map a state
pytree to an identically-shaped one, with one param structure per stage).
The flagship model (`models/point_transformer.py`, reference
`/root/reference/models/pointnet.py:8-99`) is heterogeneous: embed+PE, six
SHARED self-attention stems applied to both clouds, six (self, cross) block
pairs on the src stream, and a 3-layer coordinate head.

The TPU-idiomatic bridge used here:

  * The tiny embed and head run OUTSIDE the pipeline as plain (data-sharded
    or replicated) XLA — together they are <2% of forward FLOPs
    (docs/roofline.json: embed+head 0.3 of 27.6 floor-ms), so pipelining
    them buys nothing and would force a heterogeneous param stack.
  * The 18 block APPLICATIONS in the middle (6 stems + 6 cross-self +
    6 cross) all share one param structure (`AttentionBlock`), so they pack
    into a UNIFORM slot schedule: each pipeline stage holds ``k`` block
    slots plus a per-slot integer MODE array that says how to apply the
    block — 0 = stem (tgt then src, shared weights), 1 = self on src,
    2 = cross src<-tgt, 3 = no-op padding (zero params) used when
    ``n_stages`` does not divide 18. The mode array is part of the stacked
    stage params, so every device runs the SAME ``stage_fn`` (a
    ``lax.switch`` per slot) — exactly what `pipeline_parallel_apply`'s
    single-program shard_map needs.
  * The pipeline state is ``(src_feats, tgt_feats, masks-as-float)``; masks
    ride along so each microbatch is self-contained as it flows stage to
    stage via ppermute.

Composition with data parallelism: a ``(data, pipe)`` mesh shards the
microbatch batch dim over ``data`` while stages flow over ``pipe``
(`pipeline_parallel_apply(data_axis="data")`).

Gradient exactness: the packed forward reproduces `_Trunk` op-for-op (same
block order, same dtypes) and the stage packing happens inside the
differentiated function, so ``jax.value_and_grad`` lands gradients directly
on the standard model tree, leaf-exact vs the single-device step (tested on
the virtual CPU mesh, `tests/test_parallel_tp_pp_ep.py`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scream_tpu.config import ModelConfig
from scream_tpu.models.attention import AttentionBlock, sinusoidal_pe
from scream_tpu.parallel.pp import pipeline_parallel_apply, stack_stage_params

# Slot modes (values appear inside the stacked "modes" param leaf).
MODE_STEM, MODE_SELF, MODE_CROSS, MODE_NOOP = 0, 1, 2, 3


def flagship_slot_schedule(cfg: ModelConfig):
    """The flagship's block-application order as (trunk param name, mode).

    Mirrors `_Trunk.__call__` exactly: shared stems first (each applied to
    tgt then src), then alternating (cross_self_i, cross_attn_i) on src.
    """
    if cfg.separate_stems:
        raise ValueError("flagship PP covers the shared-stem PointTransformer")
    slots = [(f"stem_{i}", MODE_STEM) for i in range(cfg.self_layers)]
    for i in range(cfg.cross_layers):
        slots.append((f"cross_self_{i}", MODE_SELF))
        slots.append((f"cross_attn_{i}", MODE_CROSS))
    return slots


def _make_block(cfg: ModelConfig) -> AttentionBlock:
    return AttentionBlock(
        cfg.d_model, cfg.num_heads, cfg.ffn_mult, dtype=cfg.compute_dtype,
        norm_dtype=cfg.norm_compute_dtype, fused_tail=cfg.fused_block_tail,
        fused_attn=cfg.fused_attention,
    )


def pack_flagship_stages(params: Dict, cfg: ModelConfig, n_stages: int):
    """Split the model's trunk blocks into ``n_stages`` stacked stage params.

    Returns ``(stacked, k)`` where every leaf of ``stacked`` has a leading
    ``n_stages`` axis and ``k`` is slots-per-stage (schedule padded with
    zero-param NOOP slots when ``n_stages`` does not divide it).
    """
    trunk = params["trunk"]
    slots = flagship_slot_schedule(cfg)
    k = -(-len(slots) // n_stages)
    zero_block = jax.tree.map(jnp.zeros_like, trunk[slots[0][0]])
    stages = []
    for s in range(n_stages):
        chunk = slots[s * k:(s + 1) * k]
        blocks = [trunk[name] for name, _ in chunk]
        modes = [m for _, m in chunk]
        while len(blocks) < k:
            blocks.append(zero_block)
            modes.append(MODE_NOOP)
        stages.append({
            "blocks": {f"slot_{j}": b for j, b in enumerate(blocks)},
            "modes": jnp.asarray(modes, jnp.int32),
        })
    return stack_stage_params(stages), k


def _embed_apply(cfg: ModelConfig, trunk_params, src, tgt, src_mask,
                 src_center):
    """The pre-pipeline part of `_Trunk`: PE + embedding + pre_norm."""
    dt = cfg.compute_dtype
    dense = nn.Dense(cfg.d_model, use_bias=True, dtype=dt,
                     param_dtype=jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    ep = {"params": trunk_params["embedding"]}
    np_ = {"params": trunk_params["pre_norm"]}
    src_feats = sinusoidal_pe(src, cfg.d_model, dtype=dt) + dense.apply(
        ep, (src - src_center).astype(dt))
    tgt_feats = sinusoidal_pe(tgt, cfg.d_model, dtype=dt) + dense.apply(
        ep, tgt.astype(dt))
    src_feats = ln.apply(np_, src_feats).astype(dt)
    tgt_feats = ln.apply(np_, tgt_feats).astype(dt)
    return src_feats, tgt_feats


def _head_apply(cfg: ModelConfig, trunk_params, src_feats):
    """The post-pipeline coordinate head (fp32 output for the pose solve)."""
    dt = cfg.compute_dtype
    d = nn.Dense(cfg.d_model, dtype=dt, param_dtype=jnp.float32)
    h = nn.relu(d.apply({"params": trunk_params["head_0"]}, src_feats))
    h = nn.relu(d.apply({"params": trunk_params["head_1"]}, h))
    out = nn.Dense(3, dtype=jnp.float32, param_dtype=jnp.float32)
    return out.apply({"params": trunk_params["head_out"]}, h)


def make_flagship_stage_fn(cfg: ModelConfig, k: int):
    """``stage_fn(stage_params, state) -> state`` applying ``k`` block slots
    according to the stage's mode array (lax.switch per slot)."""
    block = _make_block(cfg)

    def apply_block(p, q, kv, q_mask, kv_mask):
        return block.apply({"params": p}, q, kv, kv, q_mask, kv_mask)

    def stage_fn(stage_params, state):
        src_f, tgt_f = state["src_feats"], state["tgt_feats"]
        sm = state["src_mask"] > 0.5
        tm = state["tgt_mask"] > 0.5
        modes = stage_params["modes"]
        for j in range(k):
            p = stage_params["blocks"][f"slot_{j}"]

            def stem(src_f=src_f, tgt_f=tgt_f, p=p):
                # shared weights, tgt first then src — _Trunk's order
                new_tgt = apply_block(p, tgt_f, tgt_f, tm, tm)
                new_src = apply_block(p, src_f, src_f, sm, sm)
                return new_src, new_tgt

            def self_src(src_f=src_f, tgt_f=tgt_f, p=p):
                return apply_block(p, src_f, src_f, sm, sm), tgt_f

            def cross(src_f=src_f, tgt_f=tgt_f, p=p):
                return apply_block(p, src_f, tgt_f, sm, tm), tgt_f

            def noop(src_f=src_f, tgt_f=tgt_f):
                return src_f, tgt_f

            src_f, tgt_f = jax.lax.switch(
                modes[j], (stem, self_src, cross, noop))
        return {"src_feats": src_f, "tgt_feats": tgt_f,
                "src_mask": state["src_mask"], "tgt_mask": state["tgt_mask"]}

    return stage_fn


def flagship_pp_forward(
    params: Dict,
    cfg: ModelConfig,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    src_center: jnp.ndarray,
    mesh,
    n_micro: int,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """PointTransformer forward with the block stack pipelined over ``axis``.

    ``params`` is the standard model param tree (``{"trunk": ...}``); the
    stage packing happens INSIDE this function, so differentiating through
    it lands gradients directly on the model tree (stack/slice transpose) —
    no separate unpack step. Batch must divide ``n_micro``. Output matches
    ``model.apply`` leaf-exact on CPU f32 (same ops, same order).
    """
    n_stages = mesh.shape[axis]
    stacked, k = pack_flagship_stages(params, cfg, n_stages)
    B = src.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} must divide into {n_micro} microbatches")

    trunk = params["trunk"]
    src_feats, tgt_feats = _embed_apply(cfg, trunk, src, tgt, src_mask,
                                        src_center)
    fdt = src_feats.dtype

    def mb(x):
        return x.reshape((n_micro, B // n_micro) + x.shape[1:])

    state = {
        "src_feats": mb(src_feats),
        "tgt_feats": mb(tgt_feats),
        "src_mask": mb(src_mask.astype(fdt)),
        "tgt_mask": mb(tgt_mask.astype(fdt)),
    }
    stage_fn = make_flagship_stage_fn(cfg, k)
    out = pipeline_parallel_apply(stage_fn, stacked, state, mesh, axis,
                                  data_axis=data_axis)
    feats = out["src_feats"].reshape((B,) + out["src_feats"].shape[2:])
    return _head_apply(cfg, trunk, feats)


def make_pp_registration_train_step(
    cfg: ModelConfig,
    optimizer,
    mesh,
    n_micro: int,
    center_mode: str = "trans",
    axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """The registration train step with the flagship forward pipelined.

    Drop-in for `train.steps.make_registration_train_step` on a mesh with a
    ``pipe`` axis (CLI: ``--mesh pipe=N`` or ``--mesh data=M,pipe=N``):
    same ``step(state, batch, disc=None) -> (state, metrics, None)``
    signature, same point loss (`models/point_transformer.py`, reference
    `/root/reference/models/pointnet.py:93-99`), gradients leaf-exact vs the
    single-device step. The GAN term is not offered on the PP path — the
    renderer/discriminator live outside the pipeline and the reference
    ships GAN off by default (`/root/reference/train_3d_match.py:23`).
    """
    import optax
    from functools import partial

    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.train.steps import TrainState

    def loss_fn(params, batch):
        from scream_tpu.pipeline.register import gt_center_hint

        src, tgt = batch["src"], batch["tgt"]
        src_mask, tgt_mask = batch["src_mask"], batch["tgt_mask"]
        src_center = gt_center_hint(batch["rot"], batch["trans"], center_mode)
        src_pred = flagship_pp_forward(
            params, cfg, src, tgt, src_mask, tgt_mask, src_center,
            mesh, n_micro, axis=axis, data_axis=data_axis,
        ).astype(jnp.float32)
        point_loss = PointTransformer.loss(
            src_pred, src, batch["rot"], batch["trans"], src_mask)
        return point_loss, {"point_loss": point_loss, "loss": point_loss}

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: "TrainState", batch, disc_variables=None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics, None

    return step
