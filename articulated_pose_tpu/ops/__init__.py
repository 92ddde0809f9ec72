"""Point-cloud ops: XLA-native implementations + Pallas TPU kernels.

`articulated_pose_tpu.ops` exposes the op surface of the reference's
three custom-op packages (reference: pointnet_plusplus/utils/tf_ops/)
as pure JAX functions.  Pallas variants (ops.pallas) are drop-in
replacements for the hot ops on TPU.
"""

from articulated_pose_tpu.ops.core import (
    farthest_point_sample,
    gather_point,
    group_point,
    interp_weights,
    knn_point,
    pairwise_sqdist,
    prob_sample,
    query_ball_point,
    query_ball_point_bucket,
    three_interpolate,
    three_nn,
)

__all__ = [
    "farthest_point_sample",
    "gather_point",
    "group_point",
    "interp_weights",
    "knn_point",
    "pairwise_sqdist",
    "prob_sample",
    "query_ball_point",
    "query_ball_point_bucket",
    "three_interpolate",
    "three_nn",
]
