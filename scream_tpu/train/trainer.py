"""Epoch-level trainers for the three tasks (3DMatch, KITTI, OpenGF).

TPU-native re-design of the reference's ``train()`` drivers
(`/root/reference/train_3d_match.py:156-233`, `/root/reference/train_kitti.py:138-234`,
`/root/reference/train_open_gf.py:79-148`): same recipes — Adam + stepped LR
decay, optional alternating GAN updates at weight 0.1, per-epoch validation,
best-metric checkpointing (min point loss / max success rate / min chamfer) —
but with batched jitted steps, a prefetching loader, and resumable orbax
checkpoints instead of a batch-1 Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scream_tpu.config import EvalConfig, ModelConfig, RenderConfig, TrainConfig
from scream_tpu.models.gan import PatchDiscriminator
from scream_tpu.models.point_transformer import DEMTransformer, PointTransformer
from scream_tpu.pipeline.register import register_batch
from scream_tpu.train import optim
from scream_tpu.train.steps import (
    DiscState,
    TrainState,
    init_train_state,
    make_disc_logit_fn,
    make_discriminator_step,
    make_dem_train_step,
    make_registration_train_step,
)
from scream_tpu.utils.checkpoint import BestCheckpointer
from scream_tpu.utils.logging import MetricsLogger


def _to_device(batch: Dict[str, np.ndarray], mesh=None) -> Dict[str, jnp.ndarray]:
    """Host batch -> device arrays (mesh-sharded when divisible — the shared
    policy lives in `parallel.mesh.to_device_maybe_sharded`)."""
    from scream_tpu.parallel.mesh import to_device_maybe_sharded

    return to_device_maybe_sharded(batch, mesh)


def _maybe_dump_gan_sample(trainer, fake, epoch: int) -> None:
    """Periodic GAN sample-image dump, the reference's QA artifact
    (`/root/reference/train_3d_match.py:211-214`,
    `/root/reference/train_open_gf.py:124-128`).

    The directory gate runs BEFORE reading ``state.step``: ``int(step)`` is
    a blocking device round trip (~35 ms on the tunneled TPU), which must
    not be paid on every GAN step when dumps are disabled.
    """
    if not trainer.sample_img_dir:
        return
    step_no = int(trainer.state.step)
    if step_no % trainer.train_cfg.save_img_iter != 0:
        return
    import os

    from scream_tpu.utils.viz import save_depth_image_grid

    os.makedirs(trainer.sample_img_dir, exist_ok=True)
    save_depth_image_grid(
        np.asarray(fake[0]),
        os.path.join(trainer.sample_img_dir, f"epoch{epoch}_step{step_no}.png"),
    )


def _wrap_steps_for_mesh(trainer, mesh) -> None:
    """Wrap a trainer's jitted steps for the mesh: DP (data), 2-D DP x SP
    (data x seq), or 2-D DP x TP (data x model) for the generator step,
    DP for the discriminator step.

    This is the one-flag multi-chip path (`--mesh data=N[,seq=M|,model=K]`):
    under DP/SP params and optimizer state replicate; under TP the attention
    kernels shard Megatron column/row over the model axis and the Adam
    moments inherit the same layout (`scream_tpu/parallel/tp.py`). Batches
    shard over data either way; XLA inserts every collective over ICI.
    """
    if mesh is None:
        return
    from scream_tpu.parallel import (
        data_parallel_arrays_step,
        data_parallel_step,
        data_seq_parallel_step,
        tensor_parallel_step,
    )

    seq = mesh.shape.get("seq", 1) if "seq" in mesh.axis_names else 1
    model = mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1
    pipe = mesh.shape.get("pipe", 1) if "pipe" in mesh.axis_names else 1
    if pipe > 1:
        # The PP step is already mesh-aware (shard_map over the pipe axis
        # inside, pp_flagship.py); it only needs the DP placement contract —
        # state replicated, batch sharded on data.
        trainer.train_step = data_parallel_step(trainer.train_step, mesh)
    elif model > 1:
        trainer.train_step = tensor_parallel_step(trainer.train_step, mesh)
    elif seq > 1:
        trainer.train_step = data_seq_parallel_step(
            trainer.train_step, mesh, seq_keys=trainer._seq_keys
        )
    else:
        trainer.train_step = data_parallel_step(trainer.train_step, mesh)
    if trainer.disc_step is not None:
        trainer.disc_step = data_parallel_arrays_step(trainer.disc_step, mesh)


class RegistrationTrainer:
    """Train the PointTransformer on registration pairs."""

    def __init__(
        self,
        train_loader,
        val_loader,
        model_cfg: ModelConfig = ModelConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        eval_cfg: EvalConfig = EvalConfig(),
        render_cfg: RenderConfig = RenderConfig(),
        decay_mode: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        logger: Optional[MetricsLogger] = None,
        val_use_icp: bool = True,
        sample_img_dir: Optional[str] = None,
        mesh=None,
    ):
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh
        if mesh is not None:
            from scream_tpu.parallel import is_data_only

            if not is_data_only(mesh):
                # Data-only meshes keep the fused kernels (their batch-dim
                # custom_partitioning runs them per shard —
                # `ops/partitioning.py`); a sharded seq axis falls back to
                # the unfused XLA graph, byte-identical math GSPMD can
                # propagate through.
                model_cfg = dataclasses.replace(
                    model_cfg, fused_block_tail=False,
                    fused_attention=False)
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.eval_cfg = eval_cfg
        self.render_cfg = render_cfg
        self.model = PointTransformer(self.model_cfg)
        self.logger = logger or MetricsLogger(print_every=train_cfg.log_every)
        # Reference-faithful default: BOTH reference train loops refine the
        # validation pose with ICP before computing RE/TE and (for KITTI)
        # the success rate that gates best-checkpoint saving
        # (`/root/reference/train_3d_match.py:106-153`,
        # `/root/reference/train_kitti.py:106-116` — max_iteration=1000,
        # keep-iff-both-improve). val_use_icp=False is an opt-out for quick
        # smoke runs only; leaving it off changes which epoch wins the
        # KITTI success_rate gate.
        self.val_use_icp = val_use_icp

        self.steps_per_epoch = max(len(train_loader), 1)
        self.optimizer = optim.generator_optimizer(
            train_cfg, self.steps_per_epoch, decay_mode)

        self.use_gan = train_cfg.use_gan
        if mesh is not None and self.use_gan:
            # GSPMD cannot auto-partition the Mosaic splat custom call inside
            # a sharded step (the same constraint the eval path routes around
            # with force_xla, ops/nn_pallas.py); under --mesh the GAN renderer
            # takes the pure-XLA path. The per-device batch shrinks by the
            # data-axis size, which keeps the XLA max-splat backward in HBM.
            render_cfg = dataclasses.replace(render_cfg, use_pallas=False)
            self.render_cfg = render_cfg
        self.disc = PatchDiscriminator(input_nc=2) if self.use_gan else None
        self.disc_optimizer = (
            optim.discriminator_optimizer(train_cfg) if self.use_gan else None
        )
        pipe = (mesh.shape.get("pipe", 1)
                if mesh is not None and "pipe" in mesh.axis_names else 1)
        if pipe > 1:
            # `--mesh pipe=N[,data=M]`: the flagship forward pipelines its
            # 18-block stack over the pipe axis (GPipe microbatches,
            # `parallel/pp_flagship.py`); point loss only — the reference
            # ships GAN off by default (train_3d_match.py:23) and the
            # renderer/discriminator live outside the pipeline.
            if self.use_gan:
                raise ValueError(
                    "--mesh pipe=N does not combine with GAN training; "
                    "drop use_gan or use a data/seq/model mesh")
            from scream_tpu.parallel.pp_flagship import (
                make_pp_registration_train_step,
            )

            n_micro = train_cfg.pp_microbatches or 2 * pipe
            self.train_step = make_pp_registration_train_step(
                self.model_cfg, self.optimizer, mesh, n_micro,
                center_mode=eval_cfg.center_mode, data_axis="data",
            )
        else:
            self.train_step = make_registration_train_step(
                self.model, self.optimizer,
                use_gan=self.use_gan,
                disc_apply=make_disc_logit_fn(self.disc) if self.use_gan else None,
                render_cfg=render_cfg,
                gan_weight=train_cfg.gan_weight,
                center_mode=eval_cfg.center_mode,
            )
        self.disc_step = (
            make_discriminator_step(self.disc, self.disc_optimizer, render_cfg)
            if self.use_gan
            else None
        )
        # Cloud coordinate/mask entries whose axis 1 is the point dimension
        # (sharded over the seq axis under a 2-D mesh).
        self._seq_keys = ("src", "tgt", "src_mask", "tgt_mask")
        _wrap_steps_for_mesh(self, mesh)
        mode = "max" if train_cfg.checkpoint_metric == "success_rate" else "min"
        self.checkpoint_dir = checkpoint_dir
        self.checkpointer = (
            BestCheckpointer(checkpoint_dir, mode=mode) if checkpoint_dir else None
        )
        self.sample_img_dir = sample_img_dir
        from scream_tpu.utils.profiling import ThroughputMeter

        self.throughput = ThroughputMeter()

        self._apply_fn = lambda params, src, tgt, sm, tm, center: self.model.apply(
            {"params": params}, src, tgt, sm, tm, center
        )

    def init(self, seed: Optional[int] = None):
        """Initialize generator (and discriminator) states from one batch's shapes."""
        rng = jax.random.PRNGKey(self.train_cfg.seed if seed is None else seed)
        batch = _to_device(next(iter(self.train_loader)))
        variables = self.model.init(
            rng, batch["src"], batch["tgt"], batch["src_mask"], batch["tgt_mask"],
            jnp.swapaxes(batch["trans"], -1, -2),
        )
        self.state = init_train_state(variables["params"], self.optimizer)
        self.disc_state = None
        if self.use_gan:
            from scream_tpu.ops.render import render_depth_images
            from scream_tpu.models.gan import images_to_nhwc

            imgs = render_depth_images(
                batch["src"], batch["tgt"], batch["src_mask"], batch["tgt_mask"],
                rho=self.render_cfg.rho, width=self.render_cfg.width,
                multi_view=self.render_cfg.multi_view,
                view_mode=self.render_cfg.view_mode,
                use_pallas=self.render_cfg.use_pallas,
            )
            dvars = self.disc.init(
                jax.random.PRNGKey(1), images_to_nhwc(imgs), train=False
            )
            self.disc_state = DiscState(
                {"params": dvars["params"], "batch_stats": dvars.get("batch_stats", {})},
                self.disc_optimizer.init(dvars["params"]),
            )
        return self.state

    def save_state(self, directory: str) -> None:
        """Checkpoint the FULL train state (params + optimizer + step; plus
        the discriminator state under GAN training) for resume — the
        reference can only restart from scratch
        (`/root/reference/train_3d_match.py:226-230` saves weights only, and
        its discriminator restore is a commented-out line,
        `train_kitti.py:34`)."""
        from scream_tpu.utils.checkpoint import save_params

        tree = {"gen": self.state._asdict()}
        if self.use_gan:
            tree["disc"] = self.disc_state._asdict()
        save_params(directory, tree)

    def restore_state(self, directory: str) -> None:
        from scream_tpu.train.steps import DiscState, TrainState
        from scream_tpu.utils.checkpoint import load_params

        template = {"gen": self.state._asdict()}
        if self.use_gan:
            template["disc"] = self.disc_state._asdict()
        restored = load_params(directory, template)
        self.state = TrainState(**restored["gen"])
        if self.use_gan:
            self.disc_state = DiscState(**restored["disc"])

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        from scream_tpu.data.loader import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            from scream_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
        sums: Dict[str, float] = {}
        count = 0
        for batch in prefetch_to_device(self.train_loader, sharding=sharding):
            disc_vars = self.disc_state.variables if self.use_gan else None
            self.state, metrics, fake = self.train_step(self.state, batch, disc_vars)
            if self.use_gan:
                # The GT alignment of the raw source happens inside the
                # jitted disc step (rot/trans args) — eager einsum/add here
                # would cost extra per-step dispatches on the tunneled TPU.
                self.disc_state, d_loss = self.disc_step(
                    self.disc_state, fake, batch["src"], batch["tgt"],
                    batch["src_mask"], batch["tgt_mask"],
                    batch["rot"], batch["trans"],
                )
                metrics["d_loss"] = d_loss
                _maybe_dump_gan_sample(self, fake, epoch)
            count += 1
            self.throughput.step(batch["src"].shape[0])
            # Accumulate on device; converting per step would force a sync
            # every iteration (each float() is a device round trip).
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + v
            if count % self.logger.print_every == 0:
                snap = {k: float(v) / count for k, v in sums.items()}
                snap["pairs_per_sec"] = self.throughput.items_per_sec
                self.logger.log(int(self.state.step), snap, prefix="train")
        out = {k: float(v) / max(count, 1) for k, v in sums.items()}
        out["pairs_per_sec"] = self.throughput.items_per_sec
        return out

    def evaluate(self) -> Dict[str, float]:
        """Validation: point loss + pose errors + KITTI-style success rate.

        Mirrors the in-training ``evaluate()`` loops
        (`/root/reference/train_3d_match.py:106-153`,
        `/root/reference/train_kitti.py:63-135`).
        """
        if not hasattr(self, "_val_loss_jit"):
            # Jit once: an unjitted model.apply here would dispatch op-by-op.
            from scream_tpu.pipeline.register import gt_center_hint

            def _val_loss(params, batch):
                src_center = gt_center_hint(
                    batch["rot"], batch["trans"], self.eval_cfg.center_mode
                )
                src_pred = self.model.apply(
                    {"params": params},
                    batch["src"], batch["tgt"], batch["src_mask"],
                    batch["tgt_mask"], src_center,
                ).astype(jnp.float32)
                return PointTransformer.loss(
                    src_pred, batch["src"], batch["rot"], batch["trans"],
                    batch["src_mask"],
                )

            self._val_loss_jit = jax.jit(_val_loss)

        tot_loss, tot_re, tot_te, n = 0.0, 0.0, 0.0, 0
        succ, succ_re, succ_te = 0, 0.0, 0.0
        for batch in self.val_loader:
            batch = _to_device(batch, self.mesh)
            loss = self._val_loss_jit(self.state.params, batch)
            m = register_batch(
                self._apply_fn, self.state.params, batch,
                dis_thresh=self.eval_cfg.dis_thresh, corr=self.eval_cfg.corr,
                icp_thresh=self.eval_cfg.icp_thresh,
                icp_max_iter=self.eval_cfg.icp_max_iter,
                use_icp=self.val_use_icp,
                center_mode=self.eval_cfg.center_mode,
                spmd=self.mesh is not None,
            )
            re = np.asarray(m.re_deg)
            te = np.asarray(m.te)
            b = re.shape[0]
            tot_loss += float(loss) * b
            tot_re += float(re.sum())
            tot_te += float(te.sum())
            ok = (re <= self.eval_cfg.success_re_deg) & (te <= self.eval_cfg.success_te)
            succ += int(ok.sum())
            succ_re += float(re[ok].sum())
            succ_te += float(te[ok].sum())
            n += b
        out = {
            "point_loss": tot_loss / max(n, 1),
            "rre": tot_re / max(n, 1),
            "rte": tot_te / max(n, 1),
            "success_rate": succ / max(n, 1),
            "success_rre": succ_re / max(succ, 1),
            "success_rte": succ_te / max(succ, 1),
        }
        return out

    def fit(self, epochs: Optional[int] = None,
            profile_dir: Optional[str] = None) -> Dict[str, float]:
        """Run ``epochs - 1`` training epochs (numbered 1..epochs-1).

        The exclusive upper bound is deliberate reference parity
        (`/root/reference/train_3d_match.py:159`: ``for epoch in
        range(1, epoch_num)``) — the stock 45/120-epoch configs mean 44/119
        passes there and here. ``epochs=1`` therefore trains nothing.
        A restored full state (``restore_state``) resumes at the epoch after
        the last completed one instead of re-training from epoch 1.
        """
        return _fit_loop(self, epochs, profile_dir)


def _fit_loop(trainer, epochs: Optional[int],
              profile_dir: Optional[str]) -> Dict[str, float]:
    """Shared epoch loop for both trainers: train -> validate -> log ->
    best-metric checkpoint -> full-state save (for resume).

    Resume: the restored optimizer step gives the completed-epoch count
    (one generator update per batch), so a ``restore_state``-ed trainer
    continues at the next epoch with the step-indexed LR schedule already
    positioned by the restored opt_state — not a from-scratch rerun of the
    full epoch budget on top of prior progress.
    """
    import os

    from scream_tpu.utils.profiling import trace

    epochs = epochs or trainer.train_cfg.epochs
    start = 1 + int(trainer.state.step) // trainer.steps_per_epoch
    if start > 1:
        print(f"resuming at epoch {start} "
              f"(restored step {int(trainer.state.step)})")
    last_val: Dict[str, float] = {}
    for epoch in range(start, epochs):
        # Trace only the first epoch when profiling is requested.
        with trace(profile_dir if epoch == start else None):
            train_metrics = trainer.train_epoch(epoch)
        last_val = trainer.evaluate()
        trainer.logger.log(int(trainer.state.step), last_val, prefix="val")
        print(
            f"\nepoch {epoch}  "
            + "  ".join(f"{k}: {v:.5f}"
                        for k, v in {**train_metrics, **last_val}.items())
        )
        if trainer.checkpointer:
            metric = last_val[trainer.train_cfg.checkpoint_metric]
            if trainer.checkpointer.maybe_save(metric, trainer.state.params):
                print("checkpoint saved (new best)")
        if trainer.checkpoint_dir:
            # Full state (params + opt + step + disc) every epoch — the
            # resume anchor; the reference can only restart from scratch.
            trainer.save_state(os.path.join(trainer.checkpoint_dir, "state"))
    return last_val


class DEMTrainer:
    """Train the DEMTransformer on OpenGF patches
    (`/root/reference/train_open_gf.py`)."""

    def __init__(
        self,
        train_loader,
        val_loader,
        model_cfg: ModelConfig = ModelConfig(separate_stems=True),
        train_cfg: TrainConfig = TrainConfig(checkpoint_metric="chamfer"),
        render_cfg: RenderConfig = RenderConfig(multi_view=False),
        checkpoint_dir: Optional[str] = None,
        logger: Optional[MetricsLogger] = None,
        mesh=None,
        sample_img_dir: Optional[str] = None,
    ):
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh
        self.sample_img_dir = sample_img_dir
        if mesh is not None:
            from scream_tpu.parallel import is_data_only

            if not is_data_only(mesh):
                # Same data-only-mesh fusion policy as RegistrationTrainer.
                model_cfg = dataclasses.replace(
                    model_cfg, fused_block_tail=False,
                    fused_attention=False)
        self.model = DEMTransformer(model_cfg)
        # DEM validation reports only chamfer/height_mae; the generic
        # TrainConfig default ("point_loss") would KeyError at the end of the
        # first epoch in _fit_loop. Coerce the registration default to the
        # DEM default (the pre-r2 behavior) and reject anything else early.
        if train_cfg.checkpoint_metric == "point_loss":
            train_cfg = dataclasses.replace(train_cfg, checkpoint_metric="chamfer")
        elif train_cfg.checkpoint_metric not in ("chamfer", "height_mae"):
            raise ValueError(
                f"DEMTrainer checkpoint_metric {train_cfg.checkpoint_metric!r} "
                "is not produced by DEM validation (choose 'chamfer' or "
                "'height_mae')")
        self.train_cfg = train_cfg
        self.render_cfg = render_cfg
        self.logger = logger or MetricsLogger(print_every=train_cfg.log_every)

        self.steps_per_epoch = max(len(train_loader), 1)
        self.optimizer = optim.generator_optimizer(train_cfg, self.steps_per_epoch)
        self.use_gan = train_cfg.use_gan
        if mesh is not None and self.use_gan:
            # Same Mosaic-under-GSPMD constraint as RegistrationTrainer: the
            # GAN renderer takes the pure-XLA path inside sharded steps.
            render_cfg = dataclasses.replace(render_cfg, use_pallas=False)
            self.render_cfg = render_cfg
        self.disc = PatchDiscriminator(input_nc=2) if self.use_gan else None
        self.disc_optimizer = (
            optim.discriminator_optimizer(train_cfg) if self.use_gan else None
        )
        self.train_step = make_dem_train_step(
            self.model, self.optimizer,
            use_gan=self.use_gan,
            disc_apply=make_disc_logit_fn(self.disc) if self.use_gan else None,
            render_cfg=render_cfg,
            gan_weight=train_cfg.gan_weight,
        )
        self.disc_step = (
            make_discriminator_step(self.disc, self.disc_optimizer, render_cfg)
            if self.use_gan
            else None
        )
        self._seq_keys = ("dsm", "dem", "dem_coarse", "dsm_mask", "dem_mask",
                          "dem_coarse_mask")
        _wrap_steps_for_mesh(self, mesh)
        self.checkpoint_dir = checkpoint_dir
        self.checkpointer = (
            BestCheckpointer(checkpoint_dir, mode="min") if checkpoint_dir else None
        )

    def init(self, seed: Optional[int] = None):
        # Same seed contract as RegistrationTrainer: TrainConfig.seed unless
        # explicitly overridden.
        rng = jax.random.PRNGKey(self.train_cfg.seed if seed is None else seed)
        batch = _to_device(next(iter(self.train_loader)))
        variables = self.model.init(
            rng, batch["dsm"], batch["dem_coarse"],
            batch["dsm_mask"], batch["dem_coarse_mask"],
        )
        self.state = init_train_state(variables["params"], self.optimizer)
        self.disc_state = None
        if self.use_gan:
            from scream_tpu.ops.render import render_depth_images
            from scream_tpu.models.gan import images_to_nhwc

            imgs = render_depth_images(
                batch["dsm"], batch["dem_coarse"],
                batch["dsm_mask"], batch["dem_coarse_mask"],
                rho=self.render_cfg.rho, width=self.render_cfg.width,
                multi_view=self.render_cfg.multi_view,
                view_mode=self.render_cfg.view_mode,
                use_pallas=self.render_cfg.use_pallas,
            )
            dvars = self.disc.init(jax.random.PRNGKey(1), images_to_nhwc(imgs), train=False)
            self.disc_state = DiscState(
                {"params": dvars["params"], "batch_stats": dvars.get("batch_stats", {})},
                self.disc_optimizer.init(dvars["params"]),
            )
        return self.state

    # Full-state resume, same contract as RegistrationTrainer (the reference
    # has no resume at all, SURVEY.md §5).
    save_state = RegistrationTrainer.save_state
    restore_state = RegistrationTrainer.restore_state

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        from scream_tpu.data.loader import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            from scream_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
        sums: Dict[str, float] = {}
        count = 0
        for batch in prefetch_to_device(self.train_loader, sharding=sharding):
            disc_vars = self.disc_state.variables if self.use_gan else None
            self.state, metrics, fake = self.train_step(self.state, batch, disc_vars)
            if self.use_gan:
                self.disc_state, d_loss = self.disc_step(
                    self.disc_state, fake, batch["dem"], batch["dem_coarse"],
                    batch["dem_mask"], batch["dem_coarse_mask"],
                )
                metrics["d_loss"] = d_loss
                _maybe_dump_gan_sample(self, fake, epoch)
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + v
            if count % self.logger.print_every == 0:
                snap = {k: float(v) / count for k, v in sums.items()}
                self.logger.log(int(self.state.step), snap, prefix="train")
        return {k: float(v) / max(count, 1) for k, v in sums.items()}

    def evaluate(self) -> Dict[str, float]:
        from scream_tpu.geometry.metrics import chamfer_distance, height_mae

        if not hasattr(self, "_val_metrics_jit"):
            def _val_metrics(params, batch):
                dem_pred = self.model.apply(
                    {"params": params},
                    batch["dsm"], batch["dem_coarse"],
                    batch["dsm_mask"], batch["dem_coarse_mask"],
                ).astype(jnp.float32)
                cd = chamfer_distance(dem_pred, batch["dem"], batch["dsm_mask"],
                                      batch["dem_mask"])
                h = height_mae(dem_pred, batch["dem"],
                               batch["dsm_mask"] & batch["dem_mask"])
                return cd, h

            self._val_metrics_jit = jax.jit(_val_metrics)

        tot_cd, tot_h, n = 0.0, 0.0, 0
        for batch in self.val_loader:
            batch = _to_device(batch, self.mesh)
            cd, h = self._val_metrics_jit(self.state.params, batch)
            b = cd.shape[0]
            tot_cd += float(jnp.sum(cd))
            tot_h += float(jnp.sum(h))
            n += b
        return {"chamfer": tot_cd / max(n, 1), "height_mae": tot_h / max(n, 1)}

    def fit(self, epochs: Optional[int] = None,
            profile_dir: Optional[str] = None) -> Dict[str, float]:
        """Run ``epochs - 1`` training epochs (numbered 1..epochs-1).

        Same contract as :meth:`RegistrationTrainer.fit` (reference-parity
        exclusive bound, resume from a restored state); the checkpoint gate
        honors ``train_cfg.checkpoint_metric`` ("chamfer" default,
        "height_mae" selectable — both minimized).
        """
        return _fit_loop(self, epochs, profile_dir)
