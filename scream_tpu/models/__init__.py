"""Model family: registration & DEM transformers, renderer-facing GAN."""

from scream_tpu.models.attention import AttentionBlock, linear_attention, sinusoidal_pe
from scream_tpu.models.point_transformer import PointTransformer, DEMTransformer

__all__ = [
    "AttentionBlock",
    "linear_attention",
    "sinusoidal_pe",
    "PointTransformer",
    "DEMTransformer",
]
