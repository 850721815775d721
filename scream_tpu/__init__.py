"""SCREAM-TPU: a TPU-native point-cloud registration & ground-generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the SCREAM
reference ("SCene REndering Adversarial Model", /root/reference):

  * Pairwise rigid point-cloud registration (3DMatch / 3DLoMatch / 3DZeroMatch,
    KITTI) by hallucinating the transformed source cloud and solving the pose
    with a weighted Kabsch/SVD solver plus on-device ICP refinement.
  * Ground generation (OpenGF DSM -> DEM) with the same transformer family.
  * A differentiable multi-view depth-image renderer and PatchGAN adversarial
    loss, all on-device.

Design stance (TPU-first, not a port):
  * Static shapes everywhere: point clouds are padded to buckets and carry
    boolean validity masks threaded through attention, correspondence search,
    Kabsch weights and the renderer.
  * Real batch dimension (the reference asserts batch_size==1); data-parallel
    `jax.sharding` over registration pairs replaces the Python loop.
  * bf16 compute / fp32 params replaces torch.cuda.amp.
  * The external native ops the reference leans on (Open3D voxel downsample,
    KD-tree radius search, ICP; LAPACK SVD on CPU) are first-class on-device
    XLA/Pallas kernels here.
"""

__version__ = "0.1.0"

import jax as _jax

# fp32 matmuls run at true fp32 precision (3-pass bf16 on the MXU). The
# geometry core (Kabsch covariances, pose composition, pairwise distances)
# needs this for correctness; the model hot path opts into bf16 explicitly via
# dtypes, so this does not slow the transformer compute.
_jax.config.update("jax_default_matmul_precision", "highest")

from scream_tpu import data, eval, geometry, models, ops, parallel, pipeline, train, utils

__all__ = [
    "data", "eval", "geometry", "models", "ops", "parallel", "pipeline",
    "train", "utils", "__version__",
]
