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


def _svd_rotation(M: jax.Array) -> jax.Array:
    """Proper rotation from a 3×3 cross-covariance via SVD + det flip."""
    U, D, Vh = jnp.linalg.svd(M, full_matrices=True)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    flip = jnp.where(d < 0.0, -1.0, 1.0)
    U = U.at[:, -1].multiply(flip)
    return U @ Vh


def _horn_rotation(M: jax.Array, iters: int = 12) -> jax.Array:
    """Proper rotation from a 3×3 cross-covariance by Horn's quaternion
    method with a FIXED-iteration shifted power method.

    TPU-first design note: XLA's SVD/eigh lower to while_loops whose trip
    count depends on conditioning — degenerate RANSAC minimal samples
    (duplicate points → zero covariance) made them orders of magnitude
    slower than well-conditioned inputs.  The 4×4 power iteration is a
    fixed-length fori_loop of vectorized mat-vecs: constant runtime,
    always returns a proper rotation (unit quaternion), and batches over
    thousands of hypotheses on the VPU.

    M = Σ w·target·sourceᵀ (i.e. tcᵀ@sc as used by _svd_rotation); the
    returned R maximizes tr(Rᵀ M), matching the reference rotate_pts
    (lib/d3_utils.py:206-220).
    """
    # Horn's N matrix for R maximizing tr(R^T M) with S = M^T
    # (S_ab = Σ source_a target_b).
    S = M.T
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy,        Szx - Sxz,        Sxy - Syx],
        [Syz - Szy,       Sxx - Syy - Szz,  Sxy + Syx,        Szx + Sxz],
        [Szx - Sxz,       Sxy + Syx,       -Sxx + Syy - Szz,  Syz + Szy],
        [Sxy - Syx,       Szx + Sxz,        Syz + Szy,       -Sxx - Syy + Szz],
    ])
    # Dominant eigenvector by repeated matrix squaring: with shift making
    # the spectrum positive, B^(2^k) → λ1^(2^k)·v1·v1ᵀ, so after k
    # squarings every column of B is ∝ v1 with relative error
    # (λ2/λ1)^(2^k) — 12 squarings drive even a 0.99 gap ratio to machine
    # zero at the fixed cost of 12 4×4 matmuls (plain power iteration
    # needed hundreds of steps for near-degenerate minimal samples).
    shift = jnp.sqrt(jnp.sum(N * N)) + 1e-6
    B = N + shift * jnp.eye(4)
    B = B / jnp.sqrt(jnp.sum(B * B))

    def body(_, B):
        B = B @ B
        return B / jnp.maximum(jnp.sqrt(jnp.sum(B * B)), EPS)

    B = jax.lax.fori_loop(0, iters, body, B)
    # every column is ∝ v1; take the largest for stability
    col = jnp.argmax(jnp.sum(B * B, axis=0))
    q = B[:, col]
    q = q / jnp.maximum(jnp.linalg.norm(q), EPS)
    a, b, c, d = q[0], q[1], q[2], q[3]
    return jnp.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
        [2 * (b * c + a * d), a * a - b * b + c * c - d * d, 2 * (c * d - a * b)],
        [2 * (b * d - a * c), 2 * (c * d + a * b), a * a - b * b - c * c + d * d],
    ])


def kabsch_rotation(source: jax.Array, target: jax.Array,
                    w: Optional[jax.Array] = None,
                    method: str = "horn") -> jax.Array:
    """Optimal rotation R with target ≈ R @ source (both (N, 3), centered
    internally).  Mirrors rotate_pts including the determinant flip.

    method='horn' (default): fixed-iteration quaternion solve — constant
    runtime on TPU regardless of conditioning.  method='svd': XLA SVD
    (bit-matches the reference's np.linalg.svd path; data-dependent
    while_loop runtime).
    """
    sc = source - _wmean(source, w)
    tc = target - _wmean(target, w)
    if w is not None:
        sc = sc * w[:, None]
    M = tc.T @ sc                                       # (3, 3)
    if method == "svd":
        return _svd_rotation(M)
    return _horn_rotation(M)


def pairwise_scale(source: jax.Array, target: jax.Array,
                   w: Optional[jax.Array] = None,
                   max_exact: int = 256) -> jax.Array:
    """Scale from pairwise-distance ratio (scale_pts): s = Σ|ds||dt| / Σ|ds|².

    With weights, pair (i, j) contributes w_i * w_j.

    For N ≤ max_exact this is the exact all-pairs sum (reference
    lib/d3_utils.py:237-246, and always exact for RANSAC 3-point minimal
    samples).  Beyond that the all-pairs form is O(N²) — at the refit
    sizes (N=2048, ×11 calls/frame) it dominated the whole pose stage —
    so the sums run over a fixed set of cyclic-stride pairs (i, i+k),
    a deterministic O(N·K) subsample of the same ratio estimator.
    """
    N = source.shape[0]
    if N <= max_exact:
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

    # strides spread over [1, N): small strides pair near-neighbors in
    # the (valid-first) buffers, large ones span the cloud
    strides = [max(1, (k * N) // 33) for k in range(1, 17)]
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    for k in strides:
        ds = source - jnp.roll(source, k, axis=0)
        dt = target - jnp.roll(target, k, axis=0)
        a = jnp.sqrt(jnp.maximum(jnp.sum(ds * ds, -1), 0.0))
        b = jnp.sqrt(jnp.maximum(jnp.sum(dt * dt, -1), 0.0))
        ww = 1.0 if w is None else w * jnp.roll(w, k, axis=0)
        num = num + jnp.sum(ww * a * b)
        den = den + jnp.sum(ww * a * a)
    return num / (den + 1e-6)


def transform_pts(source: jax.Array, target: jax.Array,
                  w: Optional[jax.Array] = None, method: str = "horn"
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(R, s, t) with target ≈ s·R@source + t  (d3_utils.py:223-234)."""
    R = kabsch_rotation(source, target, w, method=method)
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
