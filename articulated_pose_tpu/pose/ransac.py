"""Vmapped RANSAC for similarity alignment.

Replaces the reference's serial CPU RANSAC loops (reference:
evaluation/parallel_ancsh_pose.py:20-54 — 10000 python iterations of
3-point SVD fits per part, fanned out over processes) with a fixed-shape
hypothesis batch evaluated in one fused device program:

- H hypotheses × 3-point minimal samples drawn with explicit PRNG keys
  from the *valid* (mask) points,
- all hypothesis fits as one vmapped Kabsch + pairwise-scale solve
  (batched 3×3 SVDs),
- all H×P residuals as one einsum on the MXU,
- argmax verification and a weighted refit on the winning inlier set
  (reference: ransac() refits with model_estimator(dataset, best_inliers)).

Determinism: the reference uses unseeded np.random.randint; here
hypothesis sampling is a pure function of the PRNG key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from articulated_pose_tpu.pose import umeyama


class SimilarityFit(NamedTuple):
    R: jax.Array          # (3, 3)
    s: jax.Array          # ()
    t: jax.Array          # (3,)
    inliers: jax.Array    # (P,) bool
    score: jax.Array      # () inlier count


def masked_sample_indices(key: jax.Array, mask: jax.Array, shape,
                          compact: bool = False) -> jax.Array:
    """Uniform indices into the valid entries of `mask` (with replacement).

    Valid positions are compacted to the front in index order; draws are
    uniform over [0, cnt).  Always returns usable indices (cnt==0 -> 0).
    `compact=True` asserts the mask is already valid-first (mask[i] > 0
    iff i < cnt, e.g. buffers from pipeline.partition_by_class) and skips
    the top_k compaction — one fewer O(P log P) sort per call.
    """
    cnt = jnp.maximum(jnp.sum((mask > 0).astype(jnp.int32)), 1)
    u = jax.random.uniform(key, shape)
    draws = jnp.minimum((u * cnt).astype(jnp.int32), cnt - 1)
    if compact:
        return draws
    P = mask.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    key_order = jnp.where(mask > 0, -iota, -(P + iota))
    order = -jax.lax.top_k(key_order, P)[0]                 # valid-first
    order = jnp.where(order >= P, order - P, order)
    return order[draws]


def _fit_3pt(source3: jax.Array, target3: jax.Array):
    # unrolled 3-point specialization (same estimators as transform_pts)
    return umeyama.fit_3pt_similarity(source3, target3)


def hypothesis_inlier_counts(Rs: jax.Array, ss: jax.Array, ts: jax.Array,
                             source: jax.Array, target: jax.Array,
                             maskf: jax.Array, inlier_th: float) -> jax.Array:
    """Inlier counts for H similarity hypotheses as ONE (H,16)@(16,P) matmul.

    The naive scoring einsum materializes pred (H, P, 3) — 25 MB/frame at
    the flagship shape, so the whole RANSAC stage was HBM-bound (measured
    7.2 ms for B=64, H=1024, P=2048 on v5e).  Expanding the squared
    residual bilinearly,

      |t_p − (s_h R_h s_p + t_h)|² =
        |tgt_p|² + s_h²|src_p|² + |t_h|²
        − 2 s_h ⟨R_h, tgt_p src_pᵀ⟩ + 2 s_h ⟨R_hᵀ t_h, src_p⟩
        − 2 ⟨t_h, tgt_p⟩,

    every cross term is a contraction of a per-hypothesis feature with a
    per-point feature, so res² = A @ B + row/col offsets with A (H, 16)
    = [s·vec(R) | s·Rᵀt | t | s²] and B (16, P) = [−2·vec(tgt srcᵀ) |
    2·src | −2·tgt | |src|²] — the only (H, P) tensor is the output,
    which XLA fuses straight into the threshold+count reduction.
    Precision: HIGHEST (f32) so boundary compares match the unfused
    per-point residual; the K=16 contraction is trivially cheap.

    Rs (H,3,3), ss (H,), ts (H,3); source/target (P,3); maskf (P,) bool.
    Returns (H,) int32 inlier counts.
    """
    outer = target[:, :, None] * source[:, None, :]            # (P, 3, 3)
    Bmat = jnp.concatenate([
        -2.0 * outer.reshape(-1, 9),
        2.0 * source,
        -2.0 * target,
        jnp.sum(source * source, -1, keepdims=True),
    ], axis=-1)                                                # (P, 16)
    Rt_t = jnp.einsum("hij,hi->hj", Rs, ts)                    # Rᵀt (H, 3)
    A = jnp.concatenate([
        ss[:, None] * Rs.reshape(-1, 9),
        ss[:, None] * Rt_t,
        ts,
        (ss * ss)[:, None],
    ], axis=-1)                                                # (H, 16)
    row = jnp.sum(ts * ts, -1)                                 # (H,)
    col = jnp.sum(target * target, -1)                         # (P,)
    # NOTE: a Pallas matmul+threshold+count kernel for this contraction
    # was built and A/B'd — it measured 3.3× WORSE end to end (115.7 vs
    # 34.7 ms pose fit at B=64, H=1024, P=2048 on v5e): XLA already
    # fuses the threshold+count into the einsum consumer, and the K=16
    # contraction at HIGHEST precision wastes the MXU either way.  The
    # einsum stays (docs/perf_round3.md).
    res2 = (jnp.einsum("hk,pk->hp", A, Bmat,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
            + row[:, None] + col[None, :])
    inl = (res2 < inlier_th * inlier_th) & maskf[None]
    return jnp.sum(inl, axis=-1)


@functools.partial(jax.jit, static_argnames=("niter", "inlier_th", "chunk",
                                             "compact_mask", "score_points"))
def ransac_similarity(key: jax.Array, source: jax.Array, target: jax.Array,
                      mask: jax.Array, *, niter: int = 2048,
                      inlier_th: float = 0.1,
                      chunk: Optional[int] = None,
                      compact_mask: bool = False,
                      score_points: Optional[int] = None) -> SimilarityFit:
    """RANSAC similarity fit on masked padded buffers.

    source/target (P, 3) with mask (P,) ∈ {0,1}.  Returns the refit model
    on the best hypothesis's inliers.  `chunk` bounds the number of
    hypotheses scored at once (memory control for the (H, P) residual).

    `score_points` (requires compact_mask/valid-first buffers): rank
    hypotheses on the first `score_points` valid points only — EXACT
    whenever the part has that many points or fewer (typical parts hold
    ~N/K); beyond that, ranking uses a deterministic in-order subset.
    The best hypothesis's inlier set and the refit always use ALL
    points, so only the argmax over hypotheses can differ.
    """
    P = source.shape[0]
    idx = masked_sample_indices(key, mask, (niter, 3),
                                compact=compact_mask)           # (H, 3)
    src3 = source[idx]                                          # (H, 3, 3)
    tgt3 = target[idx]
    Rs, ss, ts = jax.vmap(_fit_3pt)(src3, tgt3)                 # (H,3,3),(H,),(H,3)

    maskf = (mask > 0)
    cap = score_points if (score_points is not None
                           and compact_mask and score_points < P) else None

    def score_chunk(args):
        R, s, t = args
        if cap is not None:
            return hypothesis_inlier_counts(R, s, t, source[:cap],
                                            target[:cap], maskf[:cap],
                                            inlier_th)
        return hypothesis_inlier_counts(R, s, t, source, target, maskf,
                                        inlier_th)

    if chunk is None or chunk >= niter:
        scores = score_chunk((Rs, ss, ts))
    else:
        n_chunks = -(-niter // chunk)
        pad = n_chunks * chunk - niter
        padded = jax.tree.map(
            lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]),
            (Rs, ss, ts))
        reshaped = jax.tree.map(
            lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), padded)
        scores = jax.lax.map(score_chunk, reshaped).reshape(-1)[:niter]

    best = jnp.argmax(scores)
    Rb, sb, tb = Rs[best], ss[best], ts[best]
    res = umeyama.similarity_residual(Rb, sb, tb, source, target)
    inliers = (res < inlier_th) & maskf
    # refit on inliers; guard the degenerate no-inlier case with the mask
    w = jnp.where(jnp.sum(inliers) >= 3, inliers, maskf).astype(source.dtype)
    Rf, sf, tf = umeyama.transform_pts(source, target, w)
    return SimilarityFit(R=Rf, s=sf, t=tf, inliers=inliers,
                         score=scores[best])
