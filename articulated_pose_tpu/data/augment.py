"""Point-cloud augmentations.

Equivalent of the reference's provider.py augmentation set (reference:
pointnet_plusplus/utils/provider.py:32-215): rotation about the up axis,
small random rotations, gaussian jitter, global shift/scale, random point
dropout.  Pure NumPy (host-side, pre-batching), deterministic under an
explicit RandomState.
"""

from __future__ import annotations

import numpy as np

from articulated_pose_tpu.utils import transforms as tr


def rotate_point_cloud_y(pts: np.ndarray, rng: np.random.RandomState,
                         angle: float = None) -> np.ndarray:
    """Rotate (N, 3) points about the y (up) axis (provider.py:32-49)."""
    a = rng.uniform(0, 2 * np.pi) if angle is None else angle
    R = tr.axis_angle_matrix(np.array([0.0, 1.0, 0.0]), a)
    return pts @ R.T


def rotate_perturbation(pts: np.ndarray, rng: np.random.RandomState,
                        angle_sigma: float = 0.06,
                        angle_clip: float = 0.18) -> np.ndarray:
    """Small random rotation about all axes (provider.py:74-97)."""
    angles = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
    R = (tr.axis_angle_matrix(np.array([1.0, 0, 0]), angles[0])
         @ tr.axis_angle_matrix(np.array([0.0, 1, 0]), angles[1])
         @ tr.axis_angle_matrix(np.array([0.0, 0, 1]), angles[2]))
    return pts @ R.T


def jitter_point_cloud(pts: np.ndarray, rng: np.random.RandomState,
                       sigma: float = 0.01, clip: float = 0.05) -> np.ndarray:
    """Gaussian per-point jitter (provider.py:99-112)."""
    return pts + np.clip(sigma * rng.randn(*pts.shape), -clip, clip)


def train_noise_batch(batch, rng: np.random.RandomState):
    """Train-time input jitter as a BATCH transform (provider.py:99-112
    policy): applied by the iterators AFTER their epoch cache, so every
    presentation draws fresh noise (a fetch-level jitter would be frozen
    into the cache to one draw per sample).  Only the network input P is
    perturbed; labels stay exact.  The single augmentation policy shared
    by the HDF5 and synthetic train paths."""
    out = dict(batch)
    out["P"] = jitter_point_cloud(batch["P"], rng).astype(np.float32)
    return out


def shift_point_cloud(pts: np.ndarray, rng: np.random.RandomState,
                      shift_range: float = 0.1) -> np.ndarray:
    """Global shift (provider.py:114-126)."""
    return pts + rng.uniform(-shift_range, shift_range, (1, 3))


def random_scale_point_cloud(pts: np.ndarray, rng: np.random.RandomState,
                             scale_low: float = 0.8,
                             scale_high: float = 1.25) -> np.ndarray:
    """Global scale (provider.py:128-141)."""
    return pts * rng.uniform(scale_low, scale_high)


def random_point_dropout(pts: np.ndarray, rng: np.random.RandomState,
                         max_dropout_ratio: float = 0.875) -> np.ndarray:
    """Replace a random fraction of points with the first point
    (provider.py:143-157) — keeps shapes static."""
    ratio = rng.rand() * max_dropout_ratio
    drop = rng.rand(len(pts)) <= ratio
    out = pts.copy()
    out[drop] = pts[0]
    return out
