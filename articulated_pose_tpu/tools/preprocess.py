"""Depth-render preprocessing: depth image → per-part point clouds → HDF5.

Equivalent of the reference preprocessor (reference:
tools/preprocess_data.py:176-365): back-projects an NDC depth buffer
through the inverse projection matrix, lifts camera points to world via
the inverse view matrix, maps each part's points to its canonical/URDF
frame via the recorded link pose, and writes the `gt_points`/`gt_coords`
HDF5 schema the training loader consumes — plus model_info.json and the
train/test split files (replacing lib/data_utils.py:76-133
`split_dataset`).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from articulated_pose_tpu.utils import transforms as tr


def depth_to_camera_points(depth: np.ndarray, proj_mat: np.ndarray,
                           mask: Optional[np.ndarray] = None,
                           flip_v: bool = True) -> np.ndarray:
    """Back-project an OpenGL-style NDC depth buffer to camera points.

    depth (H, W): the w-channel depth (negative forward, as PyBullet's
    camera returns); proj_mat (4, 4): column-major projection (viewMat/
    projMat convention of tools/preprocess_data.py:265-298).
    Returns (N, 3) camera-space points at masked pixels.
    """
    H, W = depth.shape
    xmap, ymap = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    if mask is None:
        mask = np.ones_like(depth, bool)
    xs, ys = xmap[mask], ymap[mask]
    d = depth[mask]
    u = ys * 2.0 / W - 1.0
    v = ((H - xs) if flip_v else xs) * 2.0 / H - 1.0
    w_ch = -d
    ndc_xy = np.stack([u * w_ch, v * w_ch], axis=1)        # clip-space xy
    depth_col = -w_ch.reshape(-1, 1)
    P = np.asarray(proj_mat, np.float64)
    xy_cam = (ndc_xy - depth_col @ P[0:2, 2:3].T) @ np.linalg.pinv(P[:2, :2].T)
    return np.concatenate([xy_cam, depth_col], axis=1)


def camera_to_world(cloud_cam: np.ndarray, view_mat: np.ndarray) -> np.ndarray:
    """Camera → world with the reference's sign convention
    (tools/preprocess_data.py:299-303)."""
    hom = np.concatenate([cloud_cam, np.ones((len(cloud_cam), 1))], axis=1)
    pose = np.linalg.pinv(np.asarray(view_mat, np.float64).T)
    pose[:3, :] = -pose[:3, :]
    return (hom @ pose)[:, :3]


def world_to_canonical(cloud_world: np.ndarray,
                       model2world: np.ndarray) -> np.ndarray:
    """World → the part's canonical (rest) frame via its recorded pose."""
    hom = np.concatenate([cloud_world, np.ones((len(cloud_world), 1))], axis=1)
    return (hom @ np.linalg.pinv(np.asarray(model2world, np.float64).T))[:, :3]


def preprocess_frame(depth: np.ndarray, label: np.ndarray,
                     proj_mat: np.ndarray, view_mat: np.ndarray,
                     parts_model2world: Sequence[np.ndarray],
                     n_parts: int, min_points: int = 10
                     ) -> Optional[Tuple[List[np.ndarray], List[np.ndarray]]]:
    """One rendered frame → (per-part camera clouds, canonical clouds).

    label (H, W): per-pixel part id (−1 / >= n_parts = background).
    Returns None if any part has < min_points pixels (the reference skips
    such frames, preprocess_data.py:279-281).
    """
    parts_cam, parts_canon = [], []
    for j in range(n_parts):
        m = label == j
        if m.sum() < min_points:
            return None
        cam = depth_to_camera_points(depth, proj_mat, m)
        world = camera_to_world(cam, view_mat)
        canon = world_to_canonical(world, parts_model2world[j])
        parts_cam.append(cam)
        parts_canon.append(canon)
    return parts_cam, parts_canon


def write_frame_h5(path: str, parts_cam: Sequence[np.ndarray],
                   parts_canon: Sequence[np.ndarray],
                   rgb: Optional[np.ndarray] = None,
                   mask: Optional[np.ndarray] = None) -> None:
    """gt_points/gt_coords HDF5 schema (preprocess_data.py:337-348)."""
    import h5py

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        if rgb is not None:
            f.create_dataset("rgb", data=rgb)
        if mask is not None:
            f.create_dataset("mask", data=mask)
        gp = f.create_group("gt_points")
        gc = f.create_group("gt_coords")
        for j, (cam, canon) in enumerate(zip(parts_cam, parts_canon)):
            gp.create_dataset(str(j), data=cam.astype(np.float32))
            gc.create_dataset(str(j), data=canon.astype(np.float32))


def write_splits(root_dir: str, category: str, files: Sequence[str],
                 test_instances: Sequence[str], num_expr: str = "0.01") -> None:
    """train/test split txts by held-out instances (lib/data_utils.py:76-133)."""
    from articulated_pose_tpu.data.hdf5_dataset import instance_of

    train = [f for f in files if instance_of(f) not in set(test_instances)]
    test = [f for f in files if instance_of(f) in set(test_instances)]
    split_dir = os.path.join(root_dir, "splits", category, num_expr)
    os.makedirs(split_dir, exist_ok=True)
    for name, lst in (("train", train), ("test", test)):
        with open(os.path.join(split_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(lst) + ("\n" if lst else ""))
