from articulated_pose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_train_setup,
    state_shardings,
)

__all__ = ["batch_sharding", "make_mesh", "shard_train_setup", "state_shardings"]
