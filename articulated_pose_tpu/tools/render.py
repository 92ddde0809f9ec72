"""PyBullet synthetic renderer (gated — pybullet is optional).

Equivalent of the reference renderer (reference:
tools/render_synthetic.py:52-244): loads per-part URDFs in DIRECT mode,
drives joints to sampled articulation states, waits for convergence, and
captures depth/RGB/segmentation from randomized viewpoints, recording
viewMat/projMat/link poses per frame for the preprocessor.

This environment ships no pybullet; the module raises a clear error at
construction and everything downstream (preprocess, training) is covered
by the procedural generator (data/synthetic.py) instead.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

try:
    import pybullet  # type: ignore
    HAS_PYBULLET = True
except ImportError:
    pybullet = None
    HAS_PYBULLET = False


class PyBulletRenderer:
    """Randomized-viewpoint depth/RGB/mask renderer for articulated URDFs."""

    def __init__(self, urdf_paths: Sequence[str], width: int = 512,
                 height: int = 512, fov: float = 75.0):
        if not HAS_PYBULLET:
            raise ImportError(
                "pybullet is not installed in this environment; use "
                "articulated_pose_tpu.data.synthetic.SyntheticArticulated "
                "(procedural frames with exact GT) instead")
        self.width, self.height, self.fov = width, height, fov
        self.client = pybullet.connect(pybullet.DIRECT)
        self.bodies = [pybullet.loadURDF(p) for p in urdf_paths]

    def set_articulation(self, states: Sequence[float],
                         settle_steps: int = 240) -> None:
        body = self.bodies[0]
        for j, q in enumerate(states):
            pybullet.setJointMotorControl2(
                body, j, pybullet.POSITION_CONTROL, targetPosition=q)
        for _ in range(settle_steps):
            pybullet.stepSimulation()

    def capture(self, yaw: float, pitch: float, dist: float = 2.0,
                target=(0.0, 0.0, 0.0)) -> Dict[str, np.ndarray]:
        view = pybullet.computeViewMatrixFromYawPitchRoll(
            cameraTargetPosition=target, distance=dist, yaw=yaw, pitch=pitch,
            roll=0, upAxisIndex=2)
        proj = pybullet.computeProjectionMatrixFOV(
            fov=self.fov, aspect=self.width / self.height,
            nearVal=0.1, farVal=10.0)
        w, h, rgb, depth, seg = pybullet.getCameraImage(
            self.width, self.height, view, proj,
            renderer=pybullet.ER_TINY_RENDERER)
        link_states = []
        for body in self.bodies:
            n = pybullet.getNumJoints(body)
            pos0, orn0 = pybullet.getBasePositionAndOrientation(body)
            states = [(pos0, orn0)]
            for j in range(n):
                ls = pybullet.getLinkState(body, j)
                states.append((ls[4], ls[5]))
            link_states.append(states)
        return {
            "rgb": np.asarray(rgb).reshape(h, w, -1)[..., :3],
            "depth": np.asarray(depth).reshape(h, w),
            "seg": np.asarray(seg).reshape(h, w),
            "viewMat": np.asarray(view).reshape(4, 4),
            "projMat": np.asarray(proj).reshape(4, 4),
            "link_states": link_states,
        }

    def close(self):
        pybullet.disconnect(self.client)


def random_viewpoints(rng: np.random.RandomState, n: int,
                      yaw_range=(0.0, 360.0), pitch_range=(-75.0, -15.0),
                      dist_range=(1.5, 2.5)):
    """Viewpoint sampling matching the reference's randomized camera
    (tools/render_synthetic.py:116-127)."""
    return [(rng.uniform(*yaw_range), rng.uniform(*pitch_range),
             rng.uniform(*dist_range)) for _ in range(n)]
