"""Central dataclass configuration for models, training, eval and data.

The reference has no config system — every hyperparameter is a module-level
constant edited in place (`/root/reference/train_3d_match.py:23,34-43`,
`/root/reference/train_kitti.py:24,38-50`) and mode switching means editing
``__main__`` blocks. Here a single typed config layer drives the CLI, the
trainers and the eval protocols.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PointTransformer / DEMTransformer architecture.

    Defaults mirror the reference model (`/root/reference/models/pointnet.py:8-36`):
    d_model 256, 8 heads, 6 shared self-attention stem layers, 6 cross blocks
    (each a self layer + a cross layer).
    """

    d_model: int = 256
    num_heads: int = 8
    self_layers: int = 6
    cross_layers: int = 6
    ffn_mult: int = 4
    # bf16 compute / fp32 params replaces the reference's AMP (train_kitti.py:52).
    dtype: str = "bfloat16"
    # LayerNorm computation dtype; "bfloat16" halves the norms' HBM traffic.
    norm_dtype: str = "float32"
    separate_stems: bool = False  # True for the DEM (OpenGF) variant
    remat: bool = False  # rematerialize attention blocks during training
    # Fused Pallas block-tail kernel (merge+LN+FFN+LN in VMEM, see
    # ops/ffn_pallas.py). None = auto by default backend and shape. Data-only
    # meshes keep the kernel per shard (batch-dim custom_partitioning,
    # ops/partitioning.py); forced False for seq/model-sharded meshes and
    # when compiling for CPU devices while a TPU backend is registered.
    fused_block_tail: Optional[bool] = None
    # Fused Pallas attention block (projections + linear attention + tail in
    # two kernels, see ops/attn_pallas.py). Same auto/off semantics as
    # fused_block_tail; when it fires it subsumes the tail kernel.
    fused_attention: Optional[bool] = None

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def norm_compute_dtype(self):
        return jnp.dtype(self.norm_dtype)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Depth-image renderer (`/root/reference/models/render.py:8-25`)."""

    rho: float = 24.0
    width: int = 64
    multi_view: bool = True  # 6 fixed views; False = single identity view
    # "multi" | "identity" | "back" (the KITTI GAN variant uses rho=48 with a
    # single Ry(pi) view, /root/reference/train_kitti.py:45-48); None derives
    # from multi_view.
    view_mode: Optional[str] = None
    # Pallas splat kernel: None = auto by default backend. Set False when
    # compiling for CPU devices while a TPU backend is also registered (the
    # auto check reads the default backend, not the target devices).
    use_pallas: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    3DMatch defaults from `/root/reference/train_3d_match.py:34-43`; KITTI and
    OpenGF variants override via the task presets below.
    """

    lr_g: float = 2e-4
    lr_d: float = 1e-4
    min_lr: float = 1e-5
    lr_decay_gamma: float = 0.5
    # LR-decay epoch boundaries: "every15" -> 15, 30, 45... (3DMatch/OpenGF,
    # /root/reference/train_3d_match.py:44-51); "kitti" -> 10, 30, 60, 90
    # (/root/reference/train_kitti.py:231-234: % lr_update_epoch with the
    # 10 -> 30 switch after the first decay). Consumed by
    # train.optim.generator_optimizer.
    decay_mode: str = "every15"
    epochs: int = 45
    batch_size: int = 8
    use_gan: bool = False
    gan_weight: float = 0.1
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_b1_d: float = 0.5  # discriminator betas (train_3d_match.py:41)
    seed: int = 0
    # Checkpoint destination is a trainer-constructor / CLI concern
    # (``--checkpoint-dir``), deliberately NOT a TrainConfig field: a config
    # field here was dead (never read) and merely appeared to work.
    checkpoint_metric: str = "point_loss"  # or "success_rate", "chamfer"
    save_img_iter: int = 1000
    log_every: int = 50  # trainer batch-counter interval for metric snapshots
    # GPipe microbatches for the pipeline-parallel trainer path
    # (``--mesh pipe=N``); None -> 2 x n_stages. Batch size must divide it.
    pp_microbatches: int | None = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Bucketed padding + normalization for static shapes."""

    max_points: int = 4096  # per-cloud padding bucket
    normalize: str = "unit_sphere"  # or "unit_cube" (KITTI, datasets/kitti.py:268-273)
    augment_perturb_std: float = 0.1
    augment_jitter_std: float = 0.003
    perturb_both_sides: bool = True  # 3DMatch perturbs either side; KITTI src only
    root: str = "data"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol knobs (`/root/reference/evaluate_3d_match.py:174-195`)."""

    dis_thresh: float = 0.1  # NN threshold (0.2 for zero-match)
    corr: str = "tgt"  # "src_pred" for zero-match
    icp_thresh: float = 0.1  # 1.0 for KITTI
    icp_max_iter: int = 30  # 1000 for KITTI (evaluate_kitti.py:69)
    rmse_thresh: float = 0.2  # registration recall criterion
    re_stat: str = "median"  # "mean" for zero-match
    success_re_deg: float = 5.0  # KITTI success criteria
    success_te: float = 2.0
    # The GT-derived src_center hint fed to the model: 3DMatch passes t
    # (evaluate_3d_match.py:84, train_3d_match.py:171) but KITTI passes
    # -R^T t (evaluate_kitti.py:39, train_kitti.py:156).
    center_mode: str = "trans"  # "neg_rt" for KITTI


def eval_preset(protocol: str) -> EvalConfig:
    """Per-protocol evaluation knobs, each cited to the reference driver.

    This is the single source the CLI evaluates from — every EvalConfig
    field is honored by `eval.protocols.evaluate_registration`
    (`/root/reference/evaluate_3d_match.py:174-195`,
    `/root/reference/evaluate_kitti.py:31-110`).
    """
    presets = {
        "3dmatch": EvalConfig(),
        "3dlomatch": EvalConfig(),
        "3dzeromatch": EvalConfig(dis_thresh=0.2, corr="src_pred", re_stat="mean"),
        "kitti": EvalConfig(dis_thresh=1.5, icp_thresh=1.0, icp_max_iter=1000,
                            center_mode="neg_rt"),
        "opengf": EvalConfig(),
    }
    try:
        return presets[protocol]
    except KeyError:
        raise ValueError(f"unknown eval protocol {protocol!r}") from None


def kitti_gan_render_config() -> RenderConfig:
    """The renderer override the reference applies for KITTI GAN training
    (`/root/reference/train_kitti.py:45-48`): rho 48, single back view."""
    return RenderConfig(rho=48.0, width=64, multi_view=False, view_mode="back")


def threedmatch_presets():
    return (
        ModelConfig(),
        TrainConfig(),
        DataConfig(max_points=4096, normalize="unit_sphere"),
        eval_preset("3dmatch"),
    )


def kitti_presets():
    # Eval knobs come from eval_preset("kitti") — ONE home for the cited
    # protocol constants, so CLI evaluate and train-time validation can
    # never drift apart.
    return (
        ModelConfig(),
        TrainConfig(lr_g=3.2e-4, epochs=120, decay_mode="kitti",
                    checkpoint_metric="success_rate"),
        DataConfig(max_points=8192, normalize="unit_cube", augment_jitter_std=0.0,
                   perturb_both_sides=False),
        eval_preset("kitti"),
    )


def opengf_presets():
    return (
        ModelConfig(separate_stems=True),
        TrainConfig(checkpoint_metric="chamfer"),
        DataConfig(max_points=8192, normalize="none"),
        eval_preset("opengf"),
    )
