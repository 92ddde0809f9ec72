"""NAOCS-space helpers: global→part NOCS relation + NAOCS baseline fit.

Rebuild of the reference's NAOCS-side post-processing:
- per-part scale/translation between the global NAOCS and part NOCS
  estimated from predictions (reference: evaluation/eval_joint_params.py
  :160-174, lib/aligning.py:343-432 `compute_scale_translation`),
- the NAOCS baseline pose fit = per-part RANSAC from gocs predictions
  (reference: evaluation/baseline_naocs.py:73-158) — run fit_frame with
  the gocs head as the source (see `naocs_pred_view`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def part_scale_translation(nocs: jax.Array, gocs: jax.Array,
                           w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Least-squares (s, t) with gocs ≈ s·nocs + t over weighted points.

    nocs/gocs (N, 3), w (N,).  The relation is axis-isotropic by
    construction (both spaces are corner/diagonal normalizations of the
    same canonical frame), so a single scalar scale is exact.
    Returns (s (), t (3,)).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_n = jnp.sum(nocs * w[:, None], 0) / wsum
    mu_g = jnp.sum(gocs * w[:, None], 0) / wsum
    cn = (nocs - mu_n) * w[:, None]
    cg = gocs - mu_g
    s = jnp.sum(cn * cg) / jnp.maximum(jnp.sum(cn * (nocs - mu_n)), 1e-9)
    t = mu_g - s * mu_n
    return s, t


def naocs_pred_view(pred: Dict[str, jax.Array], n_parts: int) -> Dict[str, jax.Array]:
    """Prediction dict for a NAOCS-space pose fit: the per-part source
    coordinates are the (shared) gocs head tiled into the per-part slice
    layout fit_frame expects."""
    out = dict(pred)
    g = pred["gocs_per_point"]
    if g.shape[-1] == 3 * n_parts:
        out["nocs_per_point"] = g
    else:
        out["nocs_per_point"] = jnp.tile(g, (1,) * (g.ndim - 1) + (n_parts,))
    return out
