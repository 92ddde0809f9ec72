"""Direct joint-parameter regression baseline.

Rebuild of the reference baseline that regresses joint parameters
globally instead of voting per point (reference:
lib/architecture.py:163-192 `get_direct_regression_model_baseline` over
pointnet_plusplus/architectures.py:97-122 `build_pointnet2_cls`):

- classification-style PointNet++ (SA ×2 + global SA → FC 512 → 256),
- per joint, three heads: axis (tanh), orthogonal offset direction
  (tanh), line distance (sigmoid) — the 7-dof 'orthogonal'
  parameterization of the GT joint_params (lib/dataset.py:499-506).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulated_pose_tpu.models.layers import PointConv
from articulated_pose_tpu.models.pointnet2 import SetAbstraction

Dtype = Any


class PointNet2Cls(nn.Module):
    """Classification backbone (architectures.py:97-122)."""

    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, P, *, train: bool = False, bn_momentum=0.9):
        xyz, pts = P[..., :3], None
        xyz, pts, _ = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                     dtype=self.dtype, name="sa1")(
            xyz, pts, train=train, bn_momentum=bn_momentum)
        xyz, pts, _ = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                     dtype=self.dtype, name="sa2")(
            xyz, pts, train=train, bn_momentum=bn_momentum)
        xyz, pts, _ = SetAbstraction(None, None, None, (256, 512, 1024),
                                     group_all=True, dtype=self.dtype,
                                     name="sa3")(
            xyz, pts, train=train, bn_momentum=bn_momentum)
        net = pts.reshape(pts.shape[0], -1)                     # (B, 1024)
        for i, width in enumerate((512, 256)):
            net = PointConv(width, use_bn=True, dtype=self.dtype,
                            name=f"fc{i + 1}")(net, train=train,
                                               bn_momentum=bn_momentum)
            net = nn.Dropout(rate=self.dropout_rate,
                             deterministic=not train, name=f"dp{i + 1}")(net)
        return net


class DirectJointRegression(nn.Module):
    """Per-joint global regression of (axis, orth dir, distance)."""

    n_max_parts: int = 3
    line_space: str = "orthogonal"      # 'orthogonal' (7-dof) | 'plucker'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, P, *, train: bool = False, bn_momentum=0.9
                 ) -> Dict[str, Tuple]:
        net = PointNet2Cls(dtype=self.dtype, name="backbone")(
            P, train=train, bn_momentum=bn_momentum)
        head = lambda d, name: PointConv(  # noqa: E731
            d, use_bn=False, activation=None, dtype=self.dtype,
            name=name)(net).astype(jnp.float32)
        joint_params = []
        for j in range(self.n_max_parts - 1):
            axis = jnp.tanh(head(3, f"fc3_{3 * j}"))
            orth = jnp.tanh(head(3, f"fc3_{3 * j + 1}"))
            if self.line_space == "orthogonal":
                dist = jax.nn.sigmoid(head(1, f"fc3_{3 * j + 2}"))
                joint_params.append((axis, orth, dist))
            else:
                joint_params.append((axis, orth))
        return {"joint_params": joint_params}


def direct_joint_loss(pred: Dict, joint_params_gt: jax.Array,
                      line_space: str = "orthogonal") -> Dict[str, jax.Array]:
    """Residual loss vs the 7-dof GT (lib/loss.py:203-229).

    joint_params_gt: (B, K, 7) with joint j stored at row j+1.
    """
    axis_l, orth_l, dist_l = [], [], []
    for j, jp in enumerate(pred["joint_params"]):
        gt = joint_params_gt[:, j + 1]
        axis_l.append(jnp.linalg.norm(jp[0] - gt[:, 0:3], axis=1))
        orth_l.append(jnp.linalg.norm(jp[1] - gt[:, 3:6], axis=1))
        if line_space == "orthogonal":
            dist_l.append(jnp.abs(jp[2][:, 0] - gt[:, 6]))
    out = {"axis_loss": jnp.mean(jnp.stack(axis_l, 1), 1),
           "orth_loss": jnp.mean(jnp.stack(orth_l, 1), 1)}
    if dist_l:
        out["dist_loss"] = jnp.mean(jnp.stack(dist_l, 1), 1)
    return out
