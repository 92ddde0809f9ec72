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
    fixed-length loop: constant runtime, always returns a proper rotation
    (unit quaternion).

    Layout note: the whole solve is UNROLLED scalar arithmetic over 16
    separate entries — no (…, 4, 4) arrays inside the loop.  Under vmap
    each entry is one lane, so a million-hypothesis batch runs as 64-FMA
    sweeps at full VPU occupancy; the array form padded every 4×4 matrix
    to an (8, 128) vreg tile and measured ~60× slower at the RANSAC
    batch shape (24 ms → 0.4 ms for B=64, H=1024 fits on v5e).

    M = Σ w·target·sourceᵀ (i.e. tcᵀ@sc as used by _svd_rotation); the
    returned R maximizes tr(Rᵀ M), matching the reference rotate_pts
    (lib/d3_utils.py:206-220).  Supports arbitrary leading batch dims.
    """
    # Horn's N matrix for R maximizing tr(R^T M) with S = M^T
    # (S_ab = Σ source_a target_b).
    Sxx, Syx, Szx = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Sxy, Syy, Szy = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Sxz, Syz, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = [[Sxx + Syy + Szz, Syz - Szy,        Szx - Sxz,        Sxy - Syx],
         [Syz - Szy,       Sxx - Syy - Szz,  Sxy + Syx,        Szx + Sxz],
         [Szx - Sxz,       Sxy + Syx,       -Sxx + Syy - Szz,  Syz + Szy],
         [Sxy - Syx,       Szx + Sxz,        Syz + Szy,       -Sxx - Syy + Szz]]
    # Dominant eigenvector by repeated matrix squaring: with shift making
    # the spectrum positive, B^(2^k) → λ1^(2^k)·v1·v1ᵀ, so after k
    # squarings every column of B is ∝ v1 with relative error
    # (λ2/λ1)^(2^k) — 12 squarings drive even a 0.99 gap ratio to machine
    # zero at the fixed cost of 12 unrolled 4×4 squarings (plain power
    # iteration needed hundreds of steps for near-degenerate samples).
    fro2 = sum(N[i][j] * N[i][j] for i in range(4) for j in range(4))
    shift = jnp.sqrt(fro2) + 1e-6
    B = [[N[i][j] + (shift if i == j else 0.0) for j in range(4)]
         for i in range(4)]
    nrm = jnp.sqrt(sum(B[i][j] * B[i][j] for i in range(4) for j in range(4)))
    B = [[B[i][j] / nrm for j in range(4)] for i in range(4)]

    for _ in range(iters):
        B2 = [[sum(B[i][k] * B[k][j] for k in range(4)) for j in range(4)]
              for i in range(4)]
        nrm = jnp.maximum(jnp.sqrt(sum(B2[i][j] * B2[i][j]
                                       for i in range(4)
                                       for j in range(4))), EPS)
        B = [[B2[i][j] / nrm for j in range(4)] for i in range(4)]

    # every column is ∝ v1; take the largest for stability
    colnorm = [sum(B[i][j] * B[i][j] for i in range(4)) for j in range(4)]
    best01 = jnp.where(colnorm[0] >= colnorm[1], 0, 1)
    best23 = jnp.where(colnorm[2] >= colnorm[3], 2, 3)
    n01 = jnp.maximum(colnorm[0], colnorm[1])
    n23 = jnp.maximum(colnorm[2], colnorm[3])
    col = jnp.where(n01 >= n23, best01, best23)
    q = [jnp.where(col == 0, B[i][0],
         jnp.where(col == 1, B[i][1],
         jnp.where(col == 2, B[i][2], B[i][3]))) for i in range(4)]
    qn = jnp.maximum(jnp.sqrt(sum(x * x for x in q)), EPS)
    a, b, c, d = (x / qn for x in q)
    row0 = jnp.stack([a * a + b * b - c * c - d * d,
                      2 * (b * c - a * d), 2 * (b * d + a * c)], axis=-1)
    row1 = jnp.stack([2 * (b * c + a * d),
                      a * a - b * b + c * c - d * d,
                      2 * (c * d - a * b)], axis=-1)
    row2 = jnp.stack([2 * (b * d - a * c), 2 * (c * d + a * b),
                      a * a - b * b - c * c + d * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


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
    N = source.shape[0]
    if N <= 8 and method != "svd":
        # tiny static point sets (RANSAC minimal samples, axis-augmented
        # sweeps): unroll the cross-covariance — a vmapped (3,N)@(N,3)
        # pads each matrix to a vreg tile (see _horn_rotation)
        M = jnp.stack(
            [jnp.stack([sum(tc[p, i] * sc[p, j] for p in range(N))
                        for j in range(3)], axis=-1)
             for i in range(3)], axis=-2)
    else:
        M = tc.T @ sc                                   # (3, 3)
    if method == "svd":
        return _svd_rotation(M)
    return _horn_rotation(M)


def _pairwise_sums(source: jax.Array, target: jax.Array,
                   w: Optional[jax.Array], max_exact: int):
    """(A, B, C) = (Σww·a², Σww·b², Σww·a·b) over the pair set, where
    a/b are source/target pair distances.  Shared by pairwise_scale
    (= C/A) and its inverse direction (= C/B) so both scales cost one
    distance sweep."""
    N = source.shape[0]
    if N <= max_exact:
        ds = source[:, None, :] - source[None, :, :]
        dt = target[:, None, :] - target[None, :, :]
        a = jnp.sqrt(jnp.maximum(jnp.sum(ds * ds, -1), 0.0))
        b = jnp.sqrt(jnp.maximum(jnp.sum(dt * dt, -1), 0.0))
        if w is not None:
            ww = w[:, None] * w[None, :]
            return (jnp.sum(ww * a * a), jnp.sum(ww * b * b),
                    jnp.sum(ww * a * b))
        return jnp.sum(a * a), jnp.sum(b * b), jnp.sum(a * b)

    # strides spread over [1, N): small strides pair near-neighbors in
    # the (valid-first) buffers, large ones span the cloud.  (A stacked-
    # rolls single-reduction variant was A/B'd and measured WORSE —
    # 2.7 vs 1.9 ms at B=64, N=2048 on v5e — the loop form stays.)
    strides = [max(1, (k * N) // 33) for k in range(1, 17)]
    A = jnp.zeros((), jnp.float32)
    B = jnp.zeros((), jnp.float32)
    C = jnp.zeros((), jnp.float32)
    for k in strides:
        ds = source - jnp.roll(source, k, axis=0)
        dt = target - jnp.roll(target, k, axis=0)
        a = jnp.sqrt(jnp.maximum(jnp.sum(ds * ds, -1), 0.0))
        b = jnp.sqrt(jnp.maximum(jnp.sum(dt * dt, -1), 0.0))
        ww = 1.0 if w is None else w * jnp.roll(w, k, axis=0)
        A = A + jnp.sum(ww * a * a)
        B = B + jnp.sum(ww * b * b)
        C = C + jnp.sum(ww * a * b)
    return A, B, C


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
    (The unused target-distance sum is dead-code-eliminated by XLA.)
    """
    A, _, C = _pairwise_sums(source, target, w, max_exact)
    return C / (A + 1e-6)


def pairwise_scale_both(source: jax.Array, target: jax.Array,
                        w: Optional[jax.Array] = None,
                        max_exact: int = 256) -> Tuple[jax.Array, jax.Array]:
    """(pairwise_scale(source→target), pairwise_scale(target→source)) from
    ONE pair-distance sweep.

    Both directions use the same positional pair set and weights, so the
    three sums A/B/C serve both ratios: forward = C/A, inverse = C/B.
    Matches two independent pairwise_scale calls to within multiply
    reassociation (≤1 ulp on C); halves the dominant distance cost at
    the joint-estimator call sites (lm.py), which need both directions.
    """
    A, B, C = _pairwise_sums(source, target, w, max_exact)
    return C / (A + 1e-6), C / (B + 1e-6)


def transform_pts(source: jax.Array, target: jax.Array,
                  w: Optional[jax.Array] = None, method: str = "horn"
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(R, s, t) with target ≈ s·R@source + t  (d3_utils.py:223-234)."""
    R = kabsch_rotation(source, target, w, method=method)
    s = pairwise_scale(source, target, w)
    t = _wmean(target, w) - s * (R @ _wmean(source, w))
    return R, s, t


def fit_3pt_similarity(src3: jax.Array, tgt3: jax.Array
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """transform_pts specialized to RANSAC 3-point minimal samples.

    src3/tgt3 (..., 3, 3) (points × xyz).  Same estimators as
    transform_pts — Horn rotation, exact pairwise-distance-ratio scale,
    closed-form translation — but fully unrolled over the 3 points so no
    (…, 3, 3) intermediates feed per-matrix ops inside vmap (each padded
    to a vreg tile; the generic path measured ~2.6× slower end-to-end at
    the B=64, H=1024 hypothesis batch on v5e).
    """
    s = [[src3[..., p, i] for i in range(3)] for p in range(3)]
    t = [[tgt3[..., p, i] for i in range(3)] for p in range(3)]
    mus = [(s[0][i] + s[1][i] + s[2][i]) / 3.0 for i in range(3)]
    mut = [(t[0][i] + t[1][i] + t[2][i]) / 3.0 for i in range(3)]
    sc = [[s[p][i] - mus[i] for i in range(3)] for p in range(3)]
    tc = [[t[p][i] - mut[i] for i in range(3)] for p in range(3)]
    # M = tcᵀ @ sc (as in kabsch_rotation)
    M = jnp.stack(
        [jnp.stack([sum(tc[p][i] * sc[p][j] for p in range(3))
                    for j in range(3)], axis=-1) for i in range(3)], axis=-2)
    R = _horn_rotation(M)
    # exact pairwise scale over the 3 point pairs
    num = jnp.zeros_like(mus[0])
    den = jnp.zeros_like(mus[0])
    for p, q in ((0, 1), (0, 2), (1, 2)):
        a2 = sum((s[p][i] - s[q][i]) ** 2 for i in range(3))
        b2 = sum((t[p][i] - t[q][i]) ** 2 for i in range(3))
        a = jnp.sqrt(jnp.maximum(a2, 0.0))
        num = num + a * jnp.sqrt(jnp.maximum(b2, 0.0))
        den = den + a2
    scale = num / (den + 1e-6 / 2.0)  # pairs counted once; matches
    # pairwise_scale's sym sum ratio (the ij/ji duplicates cancel)
    Rmu = [sum(R[..., i, j] * mus[j] for j in range(3)) for i in range(3)]
    trans = jnp.stack([mut[i] - scale * Rmu[i] for i in range(3)], axis=-1)
    return R, scale, trans


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
