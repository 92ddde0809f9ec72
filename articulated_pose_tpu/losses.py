"""Loss functions.

Rebuild of the reference losses (reference: lib/loss.py) in pure jnp:

- compute_miou_loss: 1 − relaxed IoU of soft assignment vs one-hot GT
  (lib/loss.py:169-182); used for both part segmentation and
  joint-association.
- compute_nocs_loss: multi-head masked coordinate regression with L2 /
  Soft-L1 / L1 options (lib/loss.py:54-102).
- compute_vect_loss: heatmap/unitvec/axis regression masked by the
  joint-association mask (lib/loss.py:104-166).
- hungarian_matching: scipy LSA, exposed for *evaluation-time* part
  matching only — the reference computes it each train step through a
  py_func but never feeds it to the loss (lib/network.py:463-465), so
  the compiled train step here simply omits it.

All losses return per-batch (B,) or (B,) summed-over-heads values, and
compose into a weighted total in `collect_losses` mirroring
lib/network.py:117-171.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

DIVISION_EPS = 1e-10


def smooth_l1_diff(diff: jax.Array, threshold: float = 0.1) -> jax.Array:
    """Soft-L1 on a (nonnegative) distance (lib/loss.py:241-252)."""
    coef = 1.0 / (2.0 * threshold)
    lt = (diff < threshold).astype(diff.dtype)
    return lt * coef * diff**2 + (1.0 - lt) * (diff - threshold / 2.0)


def _coord_diff(pred: jax.Array, gt: jax.Array, type_l: str) -> jax.Array:
    """Pointwise coordinate error (B, N): L2 norm, Soft-L1 of it, or L1 sum."""
    if type_l == "L1":
        return jnp.sum(jnp.abs(pred - gt), axis=-1)
    d = jnp.linalg.norm(pred - gt, axis=-1)
    if type_l == "Soft_L1":
        return smooth_l1_diff(d)
    return d  # L2


def compute_nocs_loss(nocs: jax.Array, nocs_gt: jax.Array,
                      confidence: Optional[jax.Array] = None, *,
                      num_parts: int, mask_array: jax.Array,
                      type_l: str = "L2", multi_head: bool = True,
                      self_supervise: bool = False) -> jax.Array:
    """Masked multi-head NOCS regression (lib/loss.py:54-84).

    nocs (B, N, 3K) per-part predictions; nocs_gt (B, N, 3);
    mask_array (B, N, K) one-hot part membership.  Returns (B,).
    """
    if not multi_head:
        d = _coord_diff(nocs, nocs_gt, type_l)
        if self_supervise:
            c = confidence[..., 0]
            return jnp.mean(d * c - 0.1 * jnp.log(c), axis=1)
        return jnp.mean(d, axis=1)

    loss = 0.0
    for i in range(num_parts):
        pred_i = nocs[..., 3 * i:3 * (i + 1)]
        mask_i = mask_array[..., i]
        d = _coord_diff(pred_i, nocs_gt, type_l)
        if self_supervise:
            c = confidence[..., 0]
            loss = loss + jnp.mean(mask_i * d * c, axis=1) \
                 - 0.1 * jnp.mean(jnp.log(c), axis=1)
        else:
            loss = loss + jnp.mean(mask_i * d, axis=1)
    return loss


def compute_vect_loss(vect: jax.Array, vect_gt: jax.Array, *,
                      confidence: Optional[jax.Array] = None,
                      type_l: str = "L2") -> jax.Array:
    """Per-point vector regression weighted by a confidence/mask (B, N).

    Mirrors the single-head branch of lib/loss.py:136-159 — the only way
    the reference calls it (heatmap/unitvec/orient with the
    joint-association mask as `confidence`).  Returns (B,).
    """
    if vect.ndim == 3 and vect.shape[-1] == 1:
        vect = vect[..., 0]
    if vect.ndim == 2:  # scalar per point (heatmap)
        d_l2 = jnp.abs(vect - vect_gt)
        d_l1 = d_l2
    else:
        d_l2 = jnp.linalg.norm(vect - vect_gt, axis=-1)
        d_l1 = jnp.sum(jnp.abs(vect - vect_gt), axis=-1)
    if confidence is not None:
        d_l2 = d_l2 * confidence
        d_l1 = d_l1 * confidence
    if type_l == "Soft_L1":
        return jnp.mean(smooth_l1_diff(d_l2), axis=1)
    if type_l == "L1":
        return jnp.mean(d_l1, axis=1)
    return jnp.mean(d_l2, axis=1)


def compute_miou_loss(W: jax.Array, I_gt: jax.Array) -> jax.Array:
    """Relaxed-IoU segmentation loss (lib/loss.py:169-182).

    W (B, N, K) soft assignment; I_gt (B, N) int labels (-1 → ignored,
    producing a zero one-hot row exactly like tf.one_hot).  Returns (B, K).
    """
    K = W.shape[-1]
    W_gt = jax.nn.one_hot(I_gt, K, dtype=W.dtype)              # (B, N, K)
    dot = jnp.sum(W_gt * W, axis=1)                            # (B, K)
    denom = jnp.sum(W_gt, axis=1) + jnp.sum(W, axis=1) - dot
    miou = dot / (denom + DIVISION_EPS)
    return 1.0 - miou


def hungarian_matching(cost: np.ndarray, n_instance_gt: np.ndarray) -> np.ndarray:
    """Host-side LSA for eval-time part matching (lib/loss.py:14-21)."""
    from scipy.optimize import linear_sum_assignment

    B, N, _ = cost.shape
    matching = np.zeros([B, N], dtype=np.int32)
    for b in range(B):
        n = int(n_instance_gt[b])
        _, matching[b, :n] = linear_sum_assignment(cost[b, :n, :])
    return matching


def compute_all_losses(pred: Dict[str, jax.Array], gt: Dict[str, jax.Array],
                       config) -> Dict[str, jax.Array]:
    """Wire predictions/GT into the loss dict (lib/network.py:421-512)."""
    K = config.n_max_parts
    type_l = config.coord_regress_loss
    loss_dict: Dict[str, jax.Array] = {}

    loss_dict["miou_loss"] = compute_miou_loss(pred["W"], gt["cls_per_point"])
    loss_dict["nocs_loss"] = compute_nocs_loss(
        pred["nocs_per_point"], gt["nocs_per_point"],
        pred.get("confi_per_point"), num_parts=K,
        mask_array=gt["mask_array_per_point"], type_l=type_l)

    if config.is_mixed:
        loss_dict["gocs_loss"] = compute_nocs_loss(
            pred["gocs_per_point"], gt["gocs_per_point"],
            pred.get("confi_per_point"), num_parts=K,
            mask_array=gt["mask_array_per_point"], type_l=type_l)

    if config.pred_joint:
        jmask = gt["joint_cls_mask"]
        loss_dict["heatmap_loss"] = compute_vect_loss(
            pred["heatmap_per_point"], gt["heatmap_per_point"],
            confidence=jmask, type_l=type_l)
        loss_dict["unitvec_loss"] = compute_vect_loss(
            pred["unitvec_per_point"], gt["unitvec_per_point"],
            confidence=jmask, type_l=type_l)
        loss_dict["orient_loss"] = compute_vect_loss(
            pred["joint_axis_per_point"], gt["orient_per_point"],
            confidence=jmask, type_l=type_l)
        loss_dict["index_loss"] = compute_miou_loss(
            pred["index_per_point"], gt["index_per_point"])

    return loss_dict


def collect_losses(loss_dict: Dict[str, jax.Array], config):
    """Weighted total + scalar summaries (lib/network.py:117-171)."""
    totals = {f"total_{k}": jnp.mean(v) for k, v in loss_dict.items()}
    total = (config.nocs_loss_multiplier * totals["total_nocs_loss"]
             + config.miou_loss_multiplier * totals["total_miou_loss"])
    if config.is_mixed:
        total = total + config.gocs_loss_multiplier * totals["total_gocs_loss"]
    if config.pred_joint:
        if config.is_mixed:
            total = total + config.offset_loss_multiplier * totals["total_heatmap_loss"]
            total = total + config.offset_loss_multiplier * totals["total_unitvec_loss"]
        total = total + config.orient_loss_multiplier * totals["total_orient_loss"]
        if config.pred_joint_ind:
            total = total + config.index_loss_multiplier * totals["total_index_loss"]
    total = total * config.total_loss_multiplier
    totals["total_loss"] = total
    return total, totals
