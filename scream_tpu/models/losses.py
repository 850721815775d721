"""Adversarial (hinge) losses for the rendering GAN.

TPU-native counterpart of `/root/reference/loss.py:16-66` (``AdversarialLoss``).
The reference wraps the discriminator in a Module with an ``optimizer_idx``
switch; here the losses are pure functions and the alternating G/D updates
live in the trainer (`scream_tpu/train/gan.py`), which is the functional
jax idiom — no hidden module state, both steps jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generator_hinge_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """``-mean(D(fake))`` (reference `/root/reference/loss.py:53-57`)."""
    return -jnp.mean(logits_fake)


def discriminator_hinge_loss(
    logits_real: jnp.ndarray, logits_fake: jnp.ndarray
) -> jnp.ndarray:
    """``0.5 * (mean(relu(1 - D(real))) + mean(relu(1 + D(fake))))``
    (reference `/root/reference/loss.py:31-35`). Callers must
    ``stop_gradient`` the images, as the reference ``detach``es them."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def adopt_weight(
    weight: jnp.ndarray, global_step: jnp.ndarray, threshold: int = 0, value: float = 0.0
) -> jnp.ndarray:
    """Gate a loss weight until ``global_step >= threshold``
    (reference `/root/reference/loss.py:26-29`), as a traced ``where``."""
    return jnp.where(global_step < threshold, value, weight)
