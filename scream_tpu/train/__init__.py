"""Training layer: optimizers/schedules, jitted steps, epoch trainers."""

from scream_tpu.train import optim
from scream_tpu.train.steps import (
    DiscState,
    TrainState,
    init_train_state,
    make_dem_train_step,
    make_disc_logit_fn,
    make_discriminator_step,
    make_registration_train_step,
)
from scream_tpu.train.trainer import DEMTrainer, RegistrationTrainer

__all__ = [
    "optim",
    "DiscState",
    "TrainState",
    "init_train_state",
    "make_dem_train_step",
    "make_disc_logit_fn",
    "make_discriminator_step",
    "make_registration_train_step",
    "DEMTrainer",
    "RegistrationTrainer",
]
