from articulated_pose_tpu.pose.umeyama import (
    kabsch_rotation,
    pairwise_scale,
    transform_pts,
    umeyama_similarity,
)
from articulated_pose_tpu.pose.ransac import ransac_similarity
from articulated_pose_tpu.pose.lm import lm_refine_joint
from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

__all__ = [
    "PoseFitConfig",
    "fit_frame_batch",
    "kabsch_rotation",
    "lm_refine_joint",
    "pairwise_scale",
    "ransac_similarity",
    "transform_pts",
    "umeyama_similarity",
]
