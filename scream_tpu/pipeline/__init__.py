"""End-to-end pipelines: registration solve, training/eval step assembly."""

from scream_tpu.pipeline.register import (
    PoseSolution,
    RegistrationMetrics,
    denormalized_gt,
    in_forward_transform,
    register_batch,
    solve_pose,
)

__all__ = [
    "PoseSolution",
    "RegistrationMetrics",
    "denormalized_gt",
    "in_forward_transform",
    "register_batch",
    "solve_pose",
]
