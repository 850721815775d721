"""End-to-end pipelines: registration solve, training/eval step assembly."""

from scream_tpu.pipeline.multiway import (
    MultiwayResult,
    default_edges,
    refine_to_map,
    register_multiway,
    synchronize_poses,
)
from scream_tpu.pipeline.register import (
    PairRegistration,
    PoseSolution,
    RegistrationMetrics,
    denormalized_gt,
    in_forward_transform,
    register_batch,
    register_batch_requeue,
    register_pair,
    register_pair_robust,
    register_pairs,
    register_pairs_robust,
    solve_pose,
)

__all__ = [
    "MultiwayResult",
    "PairRegistration",
    "default_edges",
    "refine_to_map",
    "register_multiway",
    "synchronize_poses",
    "PoseSolution",
    "RegistrationMetrics",
    "denormalized_gt",
    "in_forward_transform",
    "register_batch",
    "register_batch_requeue",
    "register_pair",
    "register_pair_robust",
    "register_pairs",
    "register_pairs_robust",
    "solve_pose",
]
