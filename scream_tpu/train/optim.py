"""Optimizers and LR schedules for the three training recipes.

Reference semantics:
  * Adam lr 2e-4 (3DMatch/OpenGF, `/root/reference/train_3d_match.py:34-39`),
    3.2e-4 (KITTI, `/root/reference/train_kitti.py:38`); discriminator Adam
    lr 1e-4 betas (0.5, 0.999) (`/root/reference/train_3d_match.py:41`).
  * Generator LR decays x0.5 with a 1e-5 floor at fixed epoch boundaries:
    every 15 epochs (3DMatch/OpenGF, `/root/reference/train_3d_match.py:44-51,231-233`),
    or first at epoch 10 then every 30 (KITTI,
    `/root/reference/train_kitti.py:231-234`).

Here the decay is an optax step-indexed schedule (the torch code mutates the
optimizer in the epoch loop); epochs are converted to steps by the trainer.
"""

from __future__ import annotations

from typing import Sequence

import optax

from scream_tpu.config import TrainConfig


def decay_epochs(mode: str, total_epochs: int) -> Sequence[int]:
    """Epoch boundaries at which the LR halves.

    ``mode``: "every15" -> 15, 30, 45...; "kitti" -> 10, 30, 60, 90
    (`/root/reference/train_kitti.py:231-234`: decay fires when
    ``epoch % lr_update_epoch == 0`` with ``lr_update_epoch`` switching
    10 -> 30 immediately after the epoch-10 decay, so the next boundaries
    are the multiples of 30).
    """
    if mode == "every15":
        return list(range(15, total_epochs + 1, 15))
    if mode == "kitti":
        return [10] + list(range(30, total_epochs + 1, 30))
    raise ValueError(f"unknown decay mode {mode!r}")


def lr_schedule(
    base_lr: float,
    boundaries_epochs: Sequence[int],
    steps_per_epoch: int,
    gamma: float = 0.5,
    min_lr: float = 1e-5,
):
    """Piecewise-constant step decay with a floor, as an optax schedule."""
    values = [base_lr]
    for _ in boundaries_epochs:
        values.append(max(values[-1] * gamma, min_lr))
    boundaries = {int(e * steps_per_epoch): values[i + 1] / values[i]
                  for i, e in enumerate(boundaries_epochs) if values[i + 1] != values[i]}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def generator_optimizer(
    cfg: TrainConfig, steps_per_epoch: int, decay_mode: str | None = None
) -> optax.GradientTransformation:
    """Adam with the epoch-boundary step decay from ``cfg.decay_mode``.

    ``decay_mode`` overrides the config field when given (legacy call sites).
    """
    sched = lr_schedule(
        cfg.lr_g,
        decay_epochs(decay_mode or cfg.decay_mode, cfg.epochs),
        steps_per_epoch,
        cfg.lr_decay_gamma,
        cfg.min_lr,
    )
    return optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2)


def discriminator_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.lr_d, b1=cfg.adam_b1_d, b2=cfg.adam_b2)
