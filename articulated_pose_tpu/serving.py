"""Serving API: checkpoint → single-call cloud-to-pose inference.

Production entry point for deployment: loads a trained checkpoint once,
compiles a fused forward + pose-fit program, and serves batches of raw
point clouds, returning per-part similarity poses, segmentation and the
voted joint parameters.  Replaces the reference's three-process offline
chain (predict_and_save → h5 files → multiprocess pose solver →
pickles) with one device call.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from articulated_pose_tpu.config import NetworkConfig
from articulated_pose_tpu.models.ancsh import build_model
from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch


@dataclasses.dataclass
class PoseResult:
    """Per-batch pose outputs (host numpy)."""

    R: np.ndarray          # (B, K, 3, 3) part rotations
    scale: np.ndarray      # (B, K)
    t: np.ndarray          # (B, K, 3)
    segmentation: np.ndarray   # (B, N) argmax part labels
    part_counts: np.ndarray    # (B, K)
    raw: Dict[str, np.ndarray] # full prediction dict (NOCS, heatmaps, ...)


class PosePredictor:
    """Compiled end-to-end predictor.

    >>> pred = PosePredictor(cfg, work_dir="results/eyeglasses/ancsh")
    >>> out = pred(clouds)          # (B, N, 3) float32
    >>> out.R[b, j], out.scale[b, j], out.t[b, j]
    """

    def __init__(self, config: NetworkConfig,
                 work_dir: Optional[str] = None,
                 params=None, batch_stats=None,
                 pose_cfg: Optional[PoseFitConfig] = None,
                 use_nonlinear: bool = True,
                 mesh=None):
        self.config = config
        self.model = build_model(config)
        if params is None:
            from articulated_pose_tpu.train.state import create_train_state
            from articulated_pose_tpu.train.trainer import Checkpointer

            assert work_dir is not None, "need work_dir or explicit params"
            import os

            # fail fast BEFORE the init compile: a missing checkpoint
            # should not cost the caller ~20s of param initialization
            ck = Checkpointer(os.path.join(work_dir, "model"))
            step = ck.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint under {work_dir}/model")
            state = create_train_state(
                self.model, config, jax.random.PRNGKey(0),
                np.zeros((1, config.num_points, 3), np.float32))
            state = ck.restore(state)
            params, batch_stats = state.params, state.batch_stats
        self.variables = {"params": params, "batch_stats": batch_stats or {}}
        spec = config.category_spec
        self.pose_cfg = pose_cfg or PoseFitConfig(
            n_parts=config.n_max_parts,
            niter_part=config.ransac_niter_part,
            niter_joint=config.ransac_niter_joint,
            inlier_th=config.ransac_inlier_th,
            joint_types=tuple(spec.joint_types))
        self.use_nonlinear = use_nonlinear and config.pred_joint

        pose_keys = ("W", "nocs_per_point", "joint_axis_per_point",
                     "index_per_point")

        def run(variables, P, key):
            pred = self.model.apply(variables, P, train=False)
            pose_pred = {k: pred[k] for k in pose_keys if k in pred}
            fits = fit_frame_batch(pose_pred, P, key, self.pose_cfg)
            return pred, fits

        self._data_axis = None
        if mesh is not None:
            # SPMD data-parallel serving: batch axis sharded over the
            # mesh's 'data' axis, kernels per-device under shard_map
            # (parallel/mesh.py::shard_serving_setup).  Batch size must
            # divide by the data-axis size.
            from articulated_pose_tpu.parallel.mesh import \
                shard_serving_setup

            self._run, self.variables, self._batch_sharding = \
                shard_serving_setup(run, self.variables, mesh)
            self._data_axis = int(mesh.shape["data"])
        else:
            self._run = jax.jit(run)
            self._batch_sharding = None
        self._key = jax.random.PRNGKey(config.seed)

    def __call__(self, clouds: np.ndarray) -> PoseResult:
        """clouds (B, N, 3) -> PoseResult.  N must match compile shape per
        distinct N (jit caches one executable per shape)."""
        P = jnp.asarray(clouds, jnp.float32)
        if self._batch_sharding is not None:
            if len(P) % self._data_axis:
                raise ValueError(
                    f"batch {len(P)} must divide by the mesh's data axis "
                    f"({self._data_axis}) for SPMD serving — pad the batch")
            P = jax.device_put(P, self._batch_sharding)
        pred, fits = self._run(self.variables, P, self._key)
        pred, fits = jax.device_get((pred, fits))
        prefix = "nonlinear" if (self.use_nonlinear and
                                 "nonlinear_R" in fits) else "baseline"
        return PoseResult(
            R=fits[f"{prefix}_R"], scale=fits[f"{prefix}_s"],
            t=fits[f"{prefix}_t"],
            segmentation=np.argmax(pred["W"], axis=-1),
            part_counts=fits["part_counts"], raw=pred)
