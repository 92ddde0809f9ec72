from articulated_pose_tpu.data.labeling import (
    JointSpec,
    NormInfo,
    build_sample,
    nocs_normalize,
    point_line_offset,
)
from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.data.batcher import BatchIterator, device_prefetch

__all__ = [
    "BatchIterator",
    "JointSpec",
    "NormInfo",
    "SyntheticArticulated",
    "build_sample",
    "device_prefetch",
    "nocs_normalize",
    "point_line_offset",
]
