"""Pix2Pix-style PatchGAN discriminator, TPU-native (flax / NHWC).

Re-design of `/root/reference/models/gan.py:15-65` (``NLayerDiscriminator``):
a stack of 4x4 convs — stride 2 doubling the filter count up to 8x, one
stride-1 BatchNorm block, and a 1-channel logit head — with the reference's
normal(0, 0.02) conv init and normal(1, 0.02) BatchNorm-scale init
(`/root/reference/models/gan.py:6-12`).

Differences by design:
  * NHWC layout (XLA's native conv layout on TPU) instead of NCHW; use
    :func:`images_to_nhwc` to feed renderer output.
  * ``input_nc`` defaults to 2 — the rendered depth images have 2 channels
    (`/root/reference/models/render.py:59`); the reference instantiates the
    discriminator with ``input_nc=3`` (`/root/reference/loss.py:20`), which is
    inconsistent with its own renderer and only unexercised because GAN
    training is disabled by default. Pass ``input_nc=3`` to reproduce that
    literal configuration.
  * Views fold into the batch dimension, so one discriminator pass scores all
    ``B x V`` images at once (the reference loops pairs at batch 1).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _conv_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.normal(key, shape, dtype) * 0.02


def _bn_scale_init(key, shape, dtype=jnp.float32):
    import jax

    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


class PatchDiscriminator(nn.Module):
    """PatchGAN: maps ``(B, H, W, C)`` images to a logit map ``(B, h, w, 1)``."""

    input_nc: int = 2
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        conv = lambda feats, stride, use_bias, name: nn.Conv(
            feats,
            kernel_size=(4, 4),
            strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init,
            name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            scale_init=_bn_scale_init,
            name=name,
        )

        # Spatial floor: n_layers stride-2 convs + two k4/s1/p1 convs each
        # shaving a pixel. Below this the logit map is empty and the hinge
        # loss silently produces zero gradients.
        min_hw = 2 ** self.n_layers * 3
        if x.shape[1] < min_hw or x.shape[2] < min_hw:
            raise ValueError(
                f"PatchDiscriminator needs inputs >= {min_hw}x{min_hw}; got "
                f"{x.shape[1]}x{x.shape[2]} (empty logit map)"
            )

        x = conv(self.ndf, 2, True, "conv_0")(x)
        x = nn.leaky_relu(x, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = conv(self.ndf * nf_mult, 2, False, f"conv_{n}")(x)
            x = bn(f"bn_{n}")(x).astype(self.dtype)
            x = nn.leaky_relu(x, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf_mult, 1, False, f"conv_{self.n_layers}")(x)
        x = bn(f"bn_{self.n_layers}")(x).astype(self.dtype)
        x = nn.leaky_relu(x, 0.2)

        return conv(1, 1, True, "conv_out")(x)


def images_to_nhwc(imgs: jnp.ndarray) -> jnp.ndarray:
    """Renderer output ``(B, V, 2, w, w)`` -> discriminator input ``(B*V, w, w, 2)``."""
    b, v, c, h, w = imgs.shape
    return jnp.transpose(imgs.reshape(b * v, c, h, w), (0, 2, 3, 1))
