from articulated_pose_tpu.eval.metrics import (
    box_iou_3d,
    bbox_from_nocs_extent,
    get_3d_bbox,
    pose_errors,
    pts_inside_box,
)
from articulated_pose_tpu.eval.pipeline import (
    EvalReport,
    compute_gt_poses,
    evaluate_fits,
    vote_joint_params,
)

__all__ = [
    "EvalReport",
    "bbox_from_nocs_extent",
    "box_iou_3d",
    "compute_gt_poses",
    "evaluate_fits",
    "get_3d_bbox",
    "pose_errors",
    "pts_inside_box",
    "vote_joint_params",
]
