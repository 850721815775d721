"""Geometry core: Lie groups, pairwise distances, Kabsch, metrics, ICP.

Everything in this package is a pure, batched, jittable jnp function.
"""

from scream_tpu.geometry import so3, se3
from scream_tpu.geometry.lie import SO3, SE3
from scream_tpu.geometry.pairwise import (
    square_distance,
    masked_square_distance,
    nearest_neighbor,
    radius_count,
)
from scream_tpu.geometry.icp import (
    ICPResult,
    icp_refine_if_better,
    registration_icp,
    registration_icp_batched,
)
from scream_tpu.geometry.normals import estimate_normals, orient_normals_towards
from scream_tpu.geometry.kabsch import kabsch, integrate_trans
from scream_tpu.geometry.metrics import (
    transformation_error,
    redwood_rmse,
    chamfer_distance,
)

__all__ = [
    "so3",
    "se3",
    "SO3",
    "SE3",
    "square_distance",
    "masked_square_distance",
    "nearest_neighbor",
    "radius_count",
    "ICPResult",
    "icp_refine_if_better",
    "registration_icp",
    "registration_icp_batched",
    "estimate_normals",
    "orient_normals_towards",
    "kabsch",
    "integrate_trans",
    "transformation_error",
    "redwood_rmse",
    "chamfer_distance",
]
