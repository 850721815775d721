"""The registration / ground-generation transformer family.

TPU-native re-design of `/root/reference/models/pointnet.py`:

  * :class:`PointTransformer` (reference `:8-99`): predicts where the source
    cloud should sit in the target frame (``src_pred``). Coord embedding =
    sinusoidal PE + Dense on centered coords; 6 *shared* self-attention stem
    layers applied to both clouds; 6 cross blocks (self on src, then cross
    src<-tgt); 3-layer coordinate head.
  * :class:`DEMTransformer` (reference `:103-167`): same skeleton with
    *separate* self-attention stems for DSM and coarse DEM and no source
    centering.

Differences by design (TPU-first):
  * Real batch dimension + validity masks (the reference asserts batch 1).
  * bf16 compute / fp32 params via ``ModelConfig.dtype``.
  * Pose solving and rendering are *not* buried inside the model forward
    (reference `:60-91` mixes them in); they live in
    `scream_tpu/pipeline/register.py` and `scream_tpu/ops/render.py` so the
    network stays a pure jittable function.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from scream_tpu.config import ModelConfig
from scream_tpu.models.attention import AttentionBlock, sinusoidal_pe


class _Trunk(nn.Module):
    """Shared encoder trunk: embed -> stems -> cross blocks -> coord head."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, src, tgt, src_mask, tgt_mask, src_center):
        cfg = self.cfg
        dt = cfg.compute_dtype

        embed = nn.Dense(
            cfg.d_model, use_bias=True, dtype=dt, param_dtype=jnp.float32,
            name="embedding",
        )
        pre_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_norm")

        # PE on raw coords + embedding on centered src coords
        # (reference models/pointnet.py:43-46).
        src_feats = sinusoidal_pe(src, cfg.d_model, dtype=dt) + embed(
            (src - src_center).astype(dt)
        )
        tgt_feats = sinusoidal_pe(tgt, cfg.d_model, dtype=dt) + embed(tgt.astype(dt))
        src_feats = pre_norm(src_feats).astype(dt)
        tgt_feats = pre_norm(tgt_feats).astype(dt)

        Block = nn.remat(AttentionBlock) if cfg.remat else AttentionBlock
        block = lambda name: Block(
            cfg.d_model, cfg.num_heads, cfg.ffn_mult, dtype=dt,
            norm_dtype=cfg.norm_compute_dtype,
            fused_tail=cfg.fused_block_tail,
            fused_attn=cfg.fused_attention, name=name
        )

        # Self-attention stems. PointTransformer shares one stack between both
        # clouds (reference :18-20, :50-52); the DEM variant uses two (:113-118).
        if cfg.separate_stems:
            for i in range(cfg.self_layers):
                src_blk = block(f"stem_src_{i}")
                tgt_blk = block(f"stem_tgt_{i}")
                src_feats = src_blk(src_feats, src_feats, src_feats, src_mask, src_mask)
                tgt_feats = tgt_blk(tgt_feats, tgt_feats, tgt_feats, tgt_mask, tgt_mask)
        else:
            for i in range(cfg.self_layers):
                blk = block(f"stem_{i}")
                tgt_feats = blk(tgt_feats, tgt_feats, tgt_feats, tgt_mask, tgt_mask)
                src_feats = blk(src_feats, src_feats, src_feats, src_mask, src_mask)

        # Cross stage: alternate (self on src, cross src<-tgt) (reference :53-57).
        for i in range(cfg.cross_layers):
            self_blk = block(f"cross_self_{i}")
            cross_blk = block(f"cross_attn_{i}")
            src_feats = self_blk(src_feats, src_feats, src_feats, src_mask, src_mask)
            src_feats = cross_blk(src_feats, tgt_feats, tgt_feats, src_mask, tgt_mask)

        # Coordinate head (reference :27-33); fp32 output for the pose solve.
        h = nn.Dense(cfg.d_model, dtype=dt, param_dtype=jnp.float32, name="head_0")(src_feats)
        h = nn.relu(h)
        h = nn.Dense(cfg.d_model, dtype=dt, param_dtype=jnp.float32, name="head_1")(h)
        h = nn.relu(h)
        src_pred = nn.Dense(3, dtype=jnp.float32, param_dtype=jnp.float32, name="head_out")(h)
        return src_pred


class PointTransformer(nn.Module):
    """Registration model: ``(src, tgt) -> src_pred`` in the target frame.

    Call with ``(B, N, 3)`` / ``(B, M, 3)`` clouds and boolean masks.
    ``src_center`` defaults to the masked src centroid
    (reference models/pointnet.py:43-44); training/eval pass the GT-derived
    hint exactly as the reference does (train_3d_match.py:171,
    evaluate_3d_match.py:84).
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        tgt: jnp.ndarray,
        src_mask: Optional[jnp.ndarray] = None,
        tgt_mask: Optional[jnp.ndarray] = None,
        src_center: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if src_mask is None:
            src_mask = jnp.ones(src.shape[:2], dtype=bool)
        if tgt_mask is None:
            tgt_mask = jnp.ones(tgt.shape[:2], dtype=bool)
        if src_center is None:
            m = src_mask[..., None].astype(src.dtype)
            src_center = jnp.sum(src * m, axis=1, keepdims=True) / jnp.clip(
                jnp.sum(m, axis=1, keepdims=True), 1.0, None
            )
        return _Trunk(self.cfg, name="trunk")(src, tgt, src_mask, tgt_mask, src_center)

    @staticmethod
    def loss(src_pred, src, rot_gt, trans_gt, src_mask=None):
        """Masked mean per-point L1 to the GT-transformed source.

        Reference `/root/reference/models/pointnet.py:93-99`: sum |.| over
        xyz, mean over points, mean over batch.
        """
        gt = jnp.einsum("bij,bnj->bni", rot_gt, src) + jnp.swapaxes(trans_gt, -1, -2)
        l1 = jnp.sum(jnp.abs(src_pred - gt), axis=-1)  # (B, N)
        if src_mask is None:
            return jnp.mean(l1)
        m = src_mask.astype(l1.dtype)
        per_item = jnp.sum(l1 * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1.0, None)
        return jnp.mean(per_item)


class DEMTransformer(nn.Module):
    """OpenGF ground generator: ``(dsm, dem_coarse) -> dem_pred``.

    Separate stems, no input centering
    (reference `/root/reference/models/pointnet.py:103-161`).
    """

    cfg: ModelConfig = ModelConfig(separate_stems=True)

    @nn.compact
    def __call__(
        self,
        dsm: jnp.ndarray,
        dem_coarse: jnp.ndarray,
        dsm_mask: Optional[jnp.ndarray] = None,
        dem_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if dsm_mask is None:
            dsm_mask = jnp.ones(dsm.shape[:2], dtype=bool)
        if dem_mask is None:
            dem_mask = jnp.ones(dem_coarse.shape[:2], dtype=bool)
        zero_center = jnp.zeros((dsm.shape[0], 1, 3), dtype=dsm.dtype)
        cfg = self.cfg
        if not cfg.separate_stems:
            import dataclasses

            cfg = dataclasses.replace(cfg, separate_stems=True)
        return _Trunk(cfg, name="trunk")(dsm, dem_coarse, dsm_mask, dem_mask, zero_center)

    @staticmethod
    def loss(dem_pred, dem_gt, mask=None):
        """Masked mean per-point L1 (reference models/pointnet.py:163-167)."""
        l1 = jnp.sum(jnp.abs(dem_pred - dem_gt), axis=-1)
        if mask is None:
            return jnp.mean(l1)
        m = mask.astype(l1.dtype)
        per_item = jnp.sum(l1 * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1.0, None)
        return jnp.mean(per_item)
