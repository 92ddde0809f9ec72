"""Point-cloud rasterization utilities.

Equivalent of the reference's pc_util helpers (reference:
pointnet_plusplus/utils/pc_util.py:24-175): voxel-occupancy volumes and
simple orthographic image projections, used for debugging/visualization.
"""

from __future__ import annotations

import numpy as np


def point_cloud_to_volume(points: np.ndarray, vsize: int = 32,
                          radius: float = 1.0) -> np.ndarray:
    """(N, 3) points in [-radius, radius]³ -> (vsize³) occupancy grid."""
    vol = np.zeros((vsize, vsize, vsize), np.float32)
    voxel = 2 * radius / vsize
    loc = ((points + radius) / voxel).astype(int)
    keep = ((loc >= 0) & (loc < vsize)).all(axis=1)
    loc = loc[keep]
    vol[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    return vol


def volume_to_point_cloud(vol: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Occupancy grid -> voxel-center points."""
    vsize = vol.shape[0]
    voxel = 2 * radius / vsize
    idx = np.argwhere(vol > 0.5)
    return idx * voxel - radius + voxel / 2


def point_cloud_to_image(points: np.ndarray, imgsize: int = 128,
                         radius: float = 1.0,
                         values: np.ndarray = None) -> np.ndarray:
    """Orthographic xy splat: (N, 3) -> (imgsize, imgsize) intensity."""
    img = np.zeros((imgsize, imgsize), np.float32)
    pix = ((points[:, :2] + radius) / (2 * radius) * imgsize).astype(int)
    keep = ((pix >= 0) & (pix < imgsize)).all(axis=1)
    pix = pix[keep]
    v = np.ones(len(pix)) if values is None else np.asarray(values)[keep]
    np.maximum.at(img, (pix[:, 1], pix[:, 0]), v)
    return img
