"""Model family: registration & DEM transformers, renderer-facing GAN."""

from scream_tpu.models.attention import AttentionBlock, linear_attention, sinusoidal_pe
from scream_tpu.models.gan import PatchDiscriminator, images_to_nhwc
from scream_tpu.models.losses import (
    adopt_weight,
    calculate_adaptive_weight,
    discriminator_hinge_loss,
    generator_hinge_loss,
)
from scream_tpu.models.point_transformer import PointTransformer, DEMTransformer

__all__ = [
    "AttentionBlock",
    "linear_attention",
    "sinusoidal_pe",
    "PatchDiscriminator",
    "images_to_nhwc",
    "adopt_weight",
    "calculate_adaptive_weight",
    "discriminator_hinge_loss",
    "generator_hinge_loss",
    "PointTransformer",
    "DEMTransformer",
]
