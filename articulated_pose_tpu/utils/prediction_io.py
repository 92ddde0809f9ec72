"""Prediction I/O: per-frame HDF5 dumps in the reference schema.

Writes one .h5 per frame with the keys the reference eval scripts read
(reference: lib/prediction_io.py:65-95 `save_batch_nn`), so saved
predictions stay cross-checkable with the reference evaluation suite:

  P, cls_gt, nocs_gt [, nocs_gt_g], instance_per_point (W),
  nocs_per_point [, gocs_per_point], confidence,
  heatmap_per_point/gt, unitvec_per_point/gt, joint_axis_per_point,
  orient_gt, index_per_point, joint_cls_gt
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

# (output key, prediction key) pairs; W keeps the reference's legacy name
_PRED_KEYS = [
    ("instance_per_point", "W"),
    ("nocs_per_point", "nocs_per_point"),
    ("gocs_per_point", "gocs_per_point"),
    ("confidence", "confi_per_point"),
    ("heatmap_per_point", "heatmap_per_point"),
    ("unitvec_per_point", "unitvec_per_point"),
    ("joint_axis_per_point", "joint_axis_per_point"),
    ("index_per_point", "index_per_point"),
]
_GT_KEYS = [
    ("P", "P"),
    ("cls_gt", "cls_gt"),
    ("nocs_gt", "nocs_gt"),
    ("nocs_gt_g", "nocs_gt_g"),
    ("heatmap_gt", "heatmap_gt"),
    ("unitvec_gt", "unitvec_gt"),
    ("orient_gt", "orient_gt"),
    ("joint_cls_gt", "joint_cls_gt"),
    # real-data (BMVC15) normalization metadata so offline eval can
    # denormalize poses back to metric camera space
    # (lib/prediction_io.py:97-129 save_batch_nn_real)
    ("P_center", "P_center"),
    ("P_scale", "P_scale"),
]


def save_batch_predictions(pred: Dict[str, np.ndarray],
                           batch: Dict[str, np.ndarray],
                           basenames: Sequence[str], save_dir: str) -> List[str]:
    """One h5 per frame (lib/prediction_io.py:65-95). Returns paths."""
    if h5py is None:
        raise ImportError("h5py is required for prediction I/O")
    os.makedirs(save_dir, exist_ok=True)
    B = len(basenames)
    paths = []
    for i in range(B):
        path = os.path.join(save_dir, f"{basenames[i]}.h5")
        with h5py.File(path, "w") as f:
            for out_key, k in _PRED_KEYS:
                if k in pred:
                    f.create_dataset(out_key, data=np.asarray(pred[k][i]),
                                     compression="gzip", compression_opts=4)
            for out_key, k in _GT_KEYS:
                if k in batch:
                    f.create_dataset(out_key, data=np.asarray(batch[k][i]),
                                     compression="gzip", compression_opts=4)
        paths.append(path)
    return paths


def load_prediction(path: str) -> Dict[str, np.ndarray]:
    if h5py is None:
        raise ImportError("h5py is required for prediction I/O")
    out = {}
    with h5py.File(path, "r") as f:
        for k in f.keys():
            out[k] = f[k][()]
    return out
