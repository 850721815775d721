"""On-device point-cloud kernels: voxel downsampling, renderer, etc."""

from scream_tpu.ops.voxel import voxel_downsample, voxel_downsample_np

__all__ = ["voxel_downsample", "voxel_downsample_np"]
