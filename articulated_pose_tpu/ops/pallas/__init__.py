from articulated_pose_tpu.ops.pallas.ball_query import (
    query_ball_point_grouped_pallas, query_ball_point_pallas)
from articulated_pose_tpu.ops.pallas.ball_query_bucket import \
    query_ball_group_bucket
from articulated_pose_tpu.ops.pallas.ball_query_butterfly import \
    query_ball_group_pallas
from articulated_pose_tpu.ops.pallas.ball_query_stream import query_ball_point_stream
from articulated_pose_tpu.ops.pallas.fps import (
    farthest_point_sample2_pallas, farthest_point_sample_pallas)
from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
from articulated_pose_tpu.ops.pallas.three_nn_stream import three_nn_stream

__all__ = ["farthest_point_sample2_pallas",
           "farthest_point_sample_pallas", "query_ball_group_bucket",
           "query_ball_group_pallas",
           "query_ball_point_grouped_pallas",
           "query_ball_point_pallas",
           "query_ball_point_stream", "three_nn_pallas",
           "three_nn_stream"]
