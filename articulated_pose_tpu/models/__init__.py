from articulated_pose_tpu.models.pointnet2 import (
    FeaturePropagation,
    PointNet2Backbone,
    SetAbstraction,
)
from articulated_pose_tpu.models.ancsh import ANCSHModel

__all__ = [
    "ANCSHModel",
    "FeaturePropagation",
    "PointNet2Backbone",
    "SetAbstraction",
]
