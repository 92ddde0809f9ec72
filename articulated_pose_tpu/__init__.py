"""articulated_pose_tpu — a TPU-native (JAX/XLA/Pallas) framework for
category-level articulated object pose estimation (ANCSH).

A ground-up rebuild of the capabilities of dragonlong/articulated-pose
(TF1 + CUDA, see /root/reference) designed for TPU:

- Point-cloud ops (FPS, ball query, grouping, 3-NN interpolation) as
  XLA-native jnp implementations plus Pallas TPU kernels
  (reference: pointnet_plusplus/utils/tf_ops/*).
- PointNet++ backbone + multi-head ANCSH model in Flax, bf16-friendly,
  jit-compiled (reference: pointnet_plusplus/architectures.py,
  lib/architecture.py).
- Losses: relaxed-IoU segmentation, masked multi-head NOCS/NAOCS
  regression, joint heatmap/unitvec/axis vector losses
  (reference: lib/loss.py).
- Training: optax Adam + exponential LR / BN-momentum schedules,
  finite-gradient guard, data-parallel pjit over a device mesh,
  Orbax checkpointing (reference: lib/network.py).
- Pose fitting: batched on-device RANSAC + Umeyama similarity
  alignment and a joint-constrained Levenberg–Marquardt refinement,
  vmapped over frames/hypotheses (reference:
  evaluation/parallel_ancsh_pose.py, lib/aligning.py) — replaces the
  reference's CPU multiprocessing fan-out.
- Evaluation: rotation/translation/scale errors, 5°/5cm accuracy,
  3D mIoU, joint axis angle & line distance (reference: evaluation/*).
"""

__version__ = "0.1.0"

from articulated_pose_tpu.config import NetworkConfig, load_config
from articulated_pose_tpu.registry import CategorySpec, get_category, DATASETS
