"""Evaluation pipeline: GT pose fitting, metric aggregation, joint params.

Rebuilds the reference's offline eval scripts as library functions:

- compute_gt_poses:  evaluation/compute_gt_pose.py:55-105 (per-part
  Umeyama of GT NOCS → input points),
- evaluate_fits:     evaluation/eval_pose_err.py:90-170 (mean per-part
  rotation/translation errors, 5°, 5°5cm) + compute_miou.py:145-241
  (3D mIoU of posed NOCS-extent boxes),
- vote_joint_params: evaluation/eval_joint_params.py:160-256 (voted
  joint point/axis, camera-frame transform via the base pose, axis angle
  and 3D line distance errors).

Unlike the reference, per-frame failures are *counted and reported*
instead of swallowed by bare try/except (SURVEY.md §4 note).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from articulated_pose_tpu.eval import metrics as M
from articulated_pose_tpu.pose import umeyama
from articulated_pose_tpu.utils import transforms as tr


@dataclasses.dataclass
class EvalReport:
    per_part: List[Dict[str, float]]
    overall: Dict[str, float]
    n_frames: int
    n_dropped: int

    def summary(self) -> str:
        lines = [f"frames: {self.n_frames} (dropped {self.n_dropped})"]
        for j, stats in enumerate(self.per_part):
            lines.append(
                f"part {j}: rot {stats['rot_err_deg_mean']:.2f}° "
                f"trans {stats['trans_err_mean']:.4f} "
                f"5° {stats['acc_5deg']:.3f} 5°5cm {stats['acc_5deg5cm']:.3f} "
                f"mIoU {stats.get('miou_mean', float('nan')):.3f}")
        o = self.overall
        lines.append(f"overall: rot {o['rot_err_deg_mean']:.2f}° "
                     f"trans {o['trans_err_mean']:.4f} "
                     f"5°5cm {o['acc_5deg5cm']:.3f}")
        return "\n".join(lines)


def compute_gt_poses(nocs_gt: np.ndarray, P: np.ndarray, cls: np.ndarray,
                     n_parts: int):
    """Per-part Umeyama similarity from GT NOCS to input points.

    nocs_gt/P (N, 3), cls (N,) -> list of dicts with R, s, t per part
    (None for parts with <5 points — the reference crashes there).
    """
    import jax.numpy as jnp

    out = []
    for j in range(n_parts):
        sel = cls == j
        if sel.sum() < 5:
            out.append(None)
            continue
        R, s, t = umeyama.umeyama_similarity(
            jnp.asarray(nocs_gt[sel]), jnp.asarray(P[sel]))
        out.append({"R": np.asarray(R), "s": float(s), "t": np.asarray(t)})
    return out


def vote_joint_params(nocs_g: np.ndarray, unitvec: np.ndarray,
                      heatmap: np.ndarray, joint_axis: np.ndarray,
                      assoc_mask: np.ndarray, base_pose: Dict,
                      thres_r: float = 0.2):
    """Voted joint line in the camera frame (eval_joint_params.py:177-241).

    Joint point (global NOCS) = mean over associated points of
    nocs_g + unitvec·(1 − heatmap)·thres_r; axis = median of the per-point
    axis.  Both mapped to camera with the base part's NAOCS pose.
    """
    sel = assoc_mask > 0
    if sel.sum() == 0:
        return None
    hm = heatmap[sel].reshape(-1, 1)
    offset = unitvec[sel] * (1.0 - hm) * thres_r
    joint_pt_nocs = (nocs_g[sel] + offset).mean(axis=0)
    axis_nocs = np.median(joint_axis[sel], axis=0)
    axis_nocs = axis_nocs / max(np.linalg.norm(axis_nocs), 1e-9)
    R, s, t = base_pose["R"], base_pose["s"], base_pose["t"]
    joint_pt_cam = s * R @ joint_pt_nocs + t
    axis_cam = R @ axis_nocs
    return {"point": joint_pt_cam, "axis": axis_cam,
            "point_nocs": joint_pt_nocs, "axis_nocs": axis_nocs}


def joint_errors(pred_line: Dict, gt_axis: np.ndarray, gt_point: np.ndarray):
    """Axis angle (deg) + line distance (eval_joint_params.py:249-256)."""
    return {
        "axis_err_deg": tr.axis_diff_degree(pred_line["axis"], gt_axis),
        "line_dist": tr.dist_between_3d_lines(
            pred_line["point"], pred_line["axis"], gt_point, gt_axis),
    }


def evaluate_fits(fits: Sequence[Dict], gts: Sequence[Dict], n_parts: int,
                  *, nocs_pred: Optional[Sequence] = None,
                  nocs_gt: Optional[Sequence] = None,
                  cls_list: Optional[Sequence] = None,
                  miou_nres: int = 50) -> EvalReport:
    """Aggregate pose metrics over frames.

    fits[i]: {"R": (K,3,3), "s": (K,), "t": (K,3)} predicted poses
    gts[i]:  same keys with GT values (entries may be None → dropped)
    Optional nocs_pred/nocs_gt/cls_list (per frame, (N,3K)/(N,3)/(N,))
    enable 3D mIoU of posed NOCS-extent boxes.
    """
    K = n_parts
    rot = [[] for _ in range(K)]
    trans = [[] for _ in range(K)]
    scale = [[] for _ in range(K)]
    miou = [[] for _ in range(K)]
    dropped = 0

    for i, (fit, gt) in enumerate(zip(fits, gts)):
        if fit is None or gt is None:
            dropped += 1
            continue
        for j in range(K):
            if gt["R"][j] is None:
                continue
            e = M.pose_errors(fit["R"][j], fit["t"][j], fit["s"][j],
                              gt["R"][j], gt["t"][j], gt["s"][j])
            rot[j].append(e["rot_err_deg"])
            # NaN translation scrub (eval_pose_err.py:132)
            trans[j].append(0.0 if not np.isfinite(e["trans_err"]) else e["trans_err"])
            scale[j].append(e["scale_err"])
            if nocs_pred is not None:
                sel = cls_list[i] == j
                if sel.sum() >= 5:
                    box_p = M.bbox_from_nocs_extent(
                        nocs_pred[i][sel][:, 3 * j:3 * (j + 1)])
                    box_g = M.bbox_from_nocs_extent(nocs_gt[i][sel])
                    bp = M.transform_bbox(box_p, fit["s"][j], fit["R"][j], fit["t"][j])
                    bg = M.transform_bbox(box_g, gt["s"][j], gt["R"][j], gt["t"][j])
                    miou[j].append(M.box_iou_3d(bp, bg, nres=miou_nres))

    per_part = []
    for j in range(K):
        r = np.asarray(rot[j]) if rot[j] else np.asarray([np.nan])
        t = np.asarray(trans[j]) if trans[j] else np.asarray([np.nan])
        stats = {
            "rot_err_deg_mean": float(np.nanmean(r)),
            "trans_err_mean": float(np.nanmean(t)),
            "scale_err_mean": float(np.nanmean(scale[j])) if scale[j] else float("nan"),
        }
        stats.update(M.accuracy_5deg5cm(r, t))
        if miou[j]:
            stats["miou_mean"] = float(np.mean(miou[j]))
        per_part.append(stats)

    all_r = np.concatenate([np.asarray(x) for x in rot if x]) if any(rot) else np.asarray([np.nan])
    all_t = np.concatenate([np.asarray(x) for x in trans if x]) if any(trans) else np.asarray([np.nan])
    overall = {
        "rot_err_deg_mean": float(np.nanmean(all_r)),
        "trans_err_mean": float(np.nanmean(all_t)),
    }
    overall.update(M.accuracy_5deg5cm(all_r, all_t))
    all_miou = [x for part in miou for x in part]
    if all_miou:
        overall["miou_mean"] = float(np.mean(all_miou))
    return EvalReport(per_part=per_part, overall=overall,
                      n_frames=len(fits) - dropped, n_dropped=dropped)
