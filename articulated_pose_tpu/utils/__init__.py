from articulated_pose_tpu.utils import transforms

__all__ = ["transforms"]
