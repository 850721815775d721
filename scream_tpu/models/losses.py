"""Adversarial (hinge) losses for the rendering GAN.

TPU-native counterpart of `/root/reference/loss.py:16-66` (``AdversarialLoss``).
The reference wraps the discriminator in a Module with an ``optimizer_idx``
switch; here the losses are pure functions and the alternating G/D updates
live in the trainer (`scream_tpu/train/steps.py`), which is the functional
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


def calculate_adaptive_weight(
    nll_grads, g_grads, discriminator_weight: float = 1.0, eps: float = 1e-4,
    max_weight: float = 1e4,
) -> jnp.ndarray:
    """VQGAN-style adaptive GAN weight from last-layer gradients.

    Functional version of `/root/reference/loss.py:37-48` (unused by the
    reference's training loops but part of its shipped loss surface): the
    ratio of reconstruction-loss to GAN-loss gradient norms at the generator's
    last layer, clipped, stop-gradient'd, scaled. Pass the two gradient
    pytrees of the last layer (e.g. from ``jax.grad`` with respect to it).
    """

    def norm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))

    w = norm(nll_grads) / (norm(g_grads) + eps)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, max_weight)) * discriminator_weight


def adopt_weight(
    weight: jnp.ndarray, global_step: jnp.ndarray, threshold: int = 0, value: float = 0.0
) -> jnp.ndarray:
    """Gate a loss weight until ``global_step >= threshold``
    (reference `/root/reference/loss.py:26-29`), as a traced ``where``."""
    return jnp.where(global_step < threshold, value, weight)
