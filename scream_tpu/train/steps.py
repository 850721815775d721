"""Jitted training steps: generator (point loss + optional GAN) and discriminator.

TPU-native re-design of the per-iteration bodies of
`/root/reference/train_3d_match.py:166-205`, `/root/reference/train_kitti.py:150-204`
and `/root/reference/train_open_gf.py:89-115`:

  * the whole step (forward, loss, backward, optimizer update, and for the
    GAN the render + discriminator passes) is ONE compiled function per task,
    batched over pairs — no per-pair Python, no host round-trips;
  * bf16 compute / fp32 params replaces torch AMP + GradScaler (bf16 needs no
    loss scaling);
  * the alternating G/D updates are two pure functions over explicit states
    instead of two optimizers mutating shared module state.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from scream_tpu.config import RenderConfig
from scream_tpu.models.losses import discriminator_hinge_loss, generator_hinge_loss
from scream_tpu.models.point_transformer import DEMTransformer, PointTransformer
from scream_tpu.ops.render import render_depth_images


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class DiscState(NamedTuple):
    variables: Any  # {"params": ..., "batch_stats": ...}
    opt_state: Any


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def _gt_aligned_src(src, rot, trans):
    return jnp.einsum("bij,bnj->bni", rot, src) + jnp.swapaxes(trans, -1, -2)


def make_registration_train_step(
    model: PointTransformer,
    optimizer: optax.GradientTransformation,
    use_gan: bool = False,
    disc_apply: Optional[Callable] = None,
    render_cfg: RenderConfig = RenderConfig(),
    gan_weight: float = 0.1,
    center_mode: str = "trans",
):
    """Build the jitted generator step for the registration tasks.

    Returns ``step(state, batch, disc_state=None) -> (state, metrics, fake_imgs)``.
    ``fake_imgs`` (stop-gradient'd) feeds the discriminator step when GAN
    training is on, mirroring the reference's re-use of the generator's
    rendered images (`/root/reference/train_3d_match.py:186-205`).
    """

    def loss_fn(params, batch, disc_variables):
        from scream_tpu.pipeline.register import gt_center_hint

        src, tgt = batch["src"], batch["tgt"]
        src_mask, tgt_mask = batch["src_mask"], batch["tgt_mask"]
        # GT hint: t for 3DMatch (reference train_3d_match.py:171), -R^T t
        # for KITTI (train_kitti.py:156).
        src_center = gt_center_hint(batch["rot"], batch["trans"], center_mode)
        src_pred = model.apply(
            {"params": params}, src, tgt, src_mask, tgt_mask, src_center
        ).astype(jnp.float32)

        point_loss = PointTransformer.loss(
            src_pred, src, batch["rot"], batch["trans"], src_mask
        )
        metrics = {"point_loss": point_loss}
        fake = None
        total = point_loss
        if use_gan:
            fake = render_depth_images(
                src_pred, tgt, src_mask, tgt_mask,
                rho=render_cfg.rho, width=render_cfg.width,
                multi_view=render_cfg.multi_view,
                view_mode=render_cfg.view_mode,
                use_pallas=render_cfg.use_pallas,
            )
            logits = disc_apply(disc_variables, fake, train=False)
            g_loss = generator_hinge_loss(logits)
            total = point_loss + gan_weight * g_loss
            metrics["g_loss"] = g_loss
        metrics["loss"] = total
        return total, (metrics, fake)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, disc_variables=None):
        (_, (metrics, fake)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, disc_variables
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        if fake is not None:
            fake = jax.lax.stop_gradient(fake)
        return new_state, metrics, fake

    return step


def make_dem_train_step(
    model: DEMTransformer,
    optimizer: optax.GradientTransformation,
    use_gan: bool = False,
    disc_apply: Optional[Callable] = None,
    render_cfg: RenderConfig = RenderConfig(multi_view=False),
    gan_weight: float = 0.1,
):
    """Generator step for OpenGF ground generation
    (`/root/reference/train_open_gf.py:89-103`). The single-view renderer
    pairs ``dem_pred`` with the coarse DEM (reference models/pointnet.py:156-159)."""

    def loss_fn(params, batch, disc_variables):
        dem_pred = model.apply(
            {"params": params},
            batch["dsm"], batch["dem_coarse"],
            batch["dsm_mask"], batch["dem_coarse_mask"],
        ).astype(jnp.float32)
        # dsm and dem are same-size in the reference; with padding, the pred
        # carries the dsm mask and the GT the dem mask. Match points by index
        # as the reference does (plain per-point L1, no NN).
        point_loss = DEMTransformer.loss(dem_pred, batch["dem"], batch["dsm_mask"] & batch["dem_mask"])
        metrics = {"point_loss": point_loss}
        fake = None
        total = point_loss
        if use_gan:
            fake = render_depth_images(
                dem_pred, batch["dem_coarse"], batch["dsm_mask"], batch["dem_coarse_mask"],
                rho=render_cfg.rho, width=render_cfg.width, multi_view=render_cfg.multi_view,
                view_mode=render_cfg.view_mode,
                use_pallas=render_cfg.use_pallas,
            )
            logits = disc_apply(disc_variables, fake, train=False)
            g_loss = generator_hinge_loss(logits)
            total = point_loss + gan_weight * g_loss
            metrics["g_loss"] = g_loss
        metrics["loss"] = total
        return total, (metrics, fake)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, disc_variables=None):
        (_, (metrics, fake)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, disc_variables
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        if fake is not None:
            fake = jax.lax.stop_gradient(fake)
        return new_state, metrics, fake

    return step


def make_discriminator_step(
    disc,  # PatchDiscriminator module
    optimizer: optax.GradientTransformation,
    render_cfg: RenderConfig = RenderConfig(),
):
    """Build the jitted discriminator hinge step.

    ``step(disc_state, fake_imgs, real_points, real_partner, masks...)``:
    renders the *real* images from the GT-aligned source (or GT DEM) exactly
    as the reference does per-iteration (`/root/reference/train_3d_match.py:195-205`),
    then one hinge update on detached real/fake.
    """
    from scream_tpu.models.gan import images_to_nhwc

    def loss_fn(params, batch_stats, fake, real):
        variables = {"params": params, "batch_stats": batch_stats}
        logits_real, mut1 = disc.apply(
            variables, images_to_nhwc(real), train=True, mutable=["batch_stats"]
        )
        variables = {"params": params, "batch_stats": mut1["batch_stats"]}
        logits_fake, mut2 = disc.apply(
            variables, images_to_nhwc(fake), train=True, mutable=["batch_stats"]
        )
        loss = discriminator_hinge_loss(logits_real, logits_fake)
        return loss, mut2["batch_stats"]

    @partial(jax.jit, donate_argnums=(0,))
    def step(disc_state: DiscState, fake, real_src, tgt, src_mask, tgt_mask,
             rot=None, trans=None):
        if rot is not None:
            # GT-align the raw source in-jit (real = render of R src + t,
            # `/root/reference/train_3d_match.py:196-199`). Doing this here
            # instead of eagerly in the trainer avoids three per-step host
            # dispatches on the tunneled TPU (~35 ms each).
            real_src = _gt_aligned_src(real_src, rot, trans)
        real = render_depth_images(
            real_src, tgt, src_mask, tgt_mask,
            rho=render_cfg.rho, width=render_cfg.width,
            multi_view=render_cfg.multi_view,
                view_mode=render_cfg.view_mode,
                use_pallas=render_cfg.use_pallas,
        )
        real = jax.lax.stop_gradient(real)
        (d_loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_state.variables["params"], disc_state.variables["batch_stats"],
            fake, real,
        )
        updates, opt_state = optimizer.update(
            grads, disc_state.opt_state, disc_state.variables["params"]
        )
        params = optax.apply_updates(disc_state.variables["params"], updates)
        new_state = DiscState(
            {"params": params, "batch_stats": new_stats}, opt_state
        )
        return new_state, d_loss

    return step


def make_disc_logit_fn(disc):
    """Frozen-discriminator logits for the generator loss.

    Uses BatchNorm *batch* statistics (train-mode normalization) with the
    stats mutation discarded — the reference's torch discriminator stays in
    train mode for the generator pass too (`/root/reference/loss.py:53-57`;
    it never calls ``.eval()``), and PatchGAN running averages are known to
    be unusable: measured on a trained discriminator, eval-mode logits
    collapse (real -4.1 vs fake -3.1, inverted) while batch-stats mode
    separates cleanly (real +4.6 vs fake -6.9). Only the parameters are
    frozen (no optimizer update); the stats side effect is dropped.
    """

    from scream_tpu.models.gan import images_to_nhwc

    def apply(variables, imgs, train=False):
        del train  # always batch-stats mode; see docstring
        logits, _ = disc.apply(
            variables, images_to_nhwc(imgs), train=True, mutable=["batch_stats"]
        )
        return logits

    return apply
