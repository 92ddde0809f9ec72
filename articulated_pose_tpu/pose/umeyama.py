"""Batched similarity alignment (Umeyama / Kabsch) in jnp.

Rebuild of the reference's NumPy/SciPy estimators as masked, weighted,
vmap-able device code:

- kabsch_rotation:  lib/d3_utils.py:206-220 `rotate_pts` (SVD of the
  3×3 cross-covariance with det flip).
- pairwise_scale:   lib/d3_utils.py:237-246 `scale_pts` (ratio of
  pairwise distance sums — the estimator the production RANSAC uses).
- transform_pts:    lib/d3_utils.py:223-234 (rotation + pairwise scale +
  closed-form translation).
- umeyama_similarity: lib/aligning.py:580-622 `estimateSimilarityUmeyama`
  (variance-based scale, used for GT pose fitting).

All functions take an optional per-point weight/mask vector so padded
fixed-size buffers work under jit; all accept leading batch dims via vmap.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-9


def _wmean(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    """Weighted mean over axis 0. x (N, 3), w (N,) or None."""
    if w is None:
        return jnp.mean(x, axis=0)
    wsum = jnp.maximum(jnp.sum(w), EPS)
    return jnp.sum(x * w[:, None], axis=0) / wsum


def kabsch_rotation(source: jax.Array, target: jax.Array,
                    w: Optional[jax.Array] = None) -> jax.Array:
    """Optimal rotation R with target ≈ R @ source (both (N, 3), centered
    internally).  Mirrors rotate_pts including the determinant flip."""
    sc = source - _wmean(source, w)
    tc = target - _wmean(target, w)
    if w is not None:
        sc = sc * w[:, None]
    M = tc.T @ sc                                       # (3, 3)
    U, D, Vh = jnp.linalg.svd(M, full_matrices=True)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    flip = jnp.where(d < 0.0, -1.0, 1.0)
    U = U.at[:, -1].multiply(flip)
    return U @ Vh


def pairwise_scale(source: jax.Array, target: jax.Array,
                   w: Optional[jax.Array] = None) -> jax.Array:
    """Scale from pairwise-distance ratio (scale_pts): s = Σ|ds||dt| / Σ|ds|².

    With weights, pair (i, j) contributes w_i * w_j.
    """
    ds = source[:, None, :] - source[None, :, :]
    dt = target[:, None, :] - target[None, :, :]
    a = jnp.sqrt(jnp.maximum(jnp.sum(ds * ds, -1), 0.0))
    b = jnp.sqrt(jnp.maximum(jnp.sum(dt * dt, -1), 0.0))
    if w is not None:
        ww = w[:, None] * w[None, :]
        num = jnp.sum(ww * a * b)
        den = jnp.sum(ww * a * a)
        return num / (den + 1e-6)
    return jnp.sum(a * b) / (jnp.sum(a * a) + 1e-6)


def transform_pts(source: jax.Array, target: jax.Array,
                  w: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(R, s, t) with target ≈ s·R@source + t  (d3_utils.py:223-234)."""
    R = kabsch_rotation(source, target, w)
    s = pairwise_scale(source, target, w)
    t = _wmean(target, w) - s * (R @ _wmean(source, w))
    return R, s, t


def umeyama_similarity(source: jax.Array, target: jax.Array,
                       w: Optional[jax.Array] = None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Umeyama similarity: variance-based scale (aligning.py:580-622).

    Returns (R, s, t) with target ≈ s·R@source + t.
    """
    mu_s = _wmean(source, w)
    mu_t = _wmean(target, w)
    sc = source - mu_s
    tc = target - mu_t
    if w is None:
        n = source.shape[0]
        cov = tc.T @ sc / n
        var_s = jnp.sum(sc * sc) / n
    else:
        wsum = jnp.maximum(jnp.sum(w), EPS)
        cov = (tc * w[:, None]).T @ sc / wsum
        var_s = jnp.sum(sc * sc * w[:, None]) / wsum
    U, D, Vh = jnp.linalg.svd(cov, full_matrices=True)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    flip = jnp.where(det < 0.0, -1.0, 1.0)
    U = U.at[:, -1].multiply(flip)
    D = D.at[-1].multiply(flip)
    R = U @ Vh
    s = jnp.sum(D) / jnp.maximum(var_s, EPS)
    t = mu_t - s * (R @ mu_s)
    return R, s, t


def similarity_residual(R: jax.Array, s: jax.Array, t: jax.Array,
                        source: jax.Array, target: jax.Array) -> jax.Array:
    """Per-point alignment residual norm (N,)."""
    pred = s * (source @ R.T) + t
    return jnp.linalg.norm(target - pred, axis=-1)
