from .evaluator import (
    GAMMA,
    NUM_FRAMES,
    dense_reward,
    derive_kinematics,
    forecast_neighbors,
    grpo_advantage,
    ref_line_matrices,
    rollout_candidates,
    sparse_reward,
)

__all__ = [
    "GAMMA",
    "NUM_FRAMES",
    "dense_reward",
    "sparse_reward",
    "derive_kinematics",
    "forecast_neighbors",
    "grpo_advantage",
    "ref_line_matrices",
    "rollout_candidates",
]
