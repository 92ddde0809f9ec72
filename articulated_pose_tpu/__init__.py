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

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even when a sitecustomize pre-imported jax
    # before the env var could take effect (it is then read too late).
    # Only intervene when the env request is NOT already satisfied by
    # the configured platform list — the image's sitecustomize maps its
    # own JAX_PLATFORMS=axon to "axon,cpu", which must be left alone.
    import jax as _jax

    _want = _os.environ["JAX_PLATFORMS"]
    _have = _jax.config.jax_platforms or ""
    # "axon" is the image's own default — sitecustomize deliberately
    # expands it to "axon,cpu" (bare "axon" breaks backend resolution),
    # so only a *user*-chosen value is enforced verbatim.
    if _want != "axon" and _have != _want:
        try:
            _jax.config.update("jax_platforms", _want)
        except RuntimeError:
            pass  # backends already initialized; user config wins elsewhere

from articulated_pose_tpu.config import NetworkConfig, load_config
from articulated_pose_tpu.registry import CategorySpec, get_category, DATASETS
