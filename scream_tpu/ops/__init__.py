"""On-device point-cloud kernels: voxel downsampling, renderer, etc."""

from scream_tpu.ops.nn_pallas import nearest_neighbor_auto, nearest_neighbor_full
from scream_tpu.ops.render import render_depth_images, render_from_config, view_matrices
from scream_tpu.ops.splat_pallas import max_splat
from scream_tpu.ops.voxel import voxel_downsample, voxel_downsample_np

__all__ = [
    "nearest_neighbor_auto",
    "nearest_neighbor_full",
    "render_depth_images",
    "render_from_config",
    "view_matrices",
    "max_splat",
    "voxel_downsample",
    "voxel_downsample_np",
]
