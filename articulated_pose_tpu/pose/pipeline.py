"""End-to-end pose fitting from network predictions.

Rebuild of the reference's offline multiprocess pose stage (reference:
evaluation/parallel_ancsh_pose.py:196-370 `solver_ransac_nonlinear` +
evaluation/pose_multi_process.py) as a single jit/vmap device program:

Per frame:
1. argmax the predicted segmentation → padded per-part point sets
   (fixed-size order/mask buffers replace the ragged np.where lists,
   parallel_ancsh_pose.py:238-242),
2. per-part RANSAC similarity fit from part-NOCS → input points
   ("baseline", :258-285),
3. joint-axis vote: median of the predicted per-point axis over the
   joint-associated points (:295) — predicted association by default,
   GT association optional (the reference's evaluation/ variant),
4. joint-constrained RANSAC: 3-point pairs from base and moving part,
   coupled LM refinement, mean-inlier-fraction verification, refit on
   the best inlier sets ("nonlinear", :287-306).

The whole batch of frames runs as one vmap — there is no process pool,
no pickle shards (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from articulated_pose_tpu.pose import umeyama
from articulated_pose_tpu.pose.lm import (joint_transformation_estimate,
                                          joint_transformation_estimate_alt)
from articulated_pose_tpu.pose.ransac import masked_sample_indices, ransac_similarity


@dataclasses.dataclass(frozen=True)
class PoseFitConfig:
    n_parts: int = 3
    # Hypothesis counts: the reference runs 10000 serial CPU iters (:262)
    # / 200 joint iters (:288).  Batched 3-point RANSAC saturates far
    # earlier: accuracy is FLAT from 2048 down to 128 hypotheses even at
    # 30% segmentation flips + 0.06 NOCS noise (well beyond trained-model
    # error; scripts/ab_ransac_strength.py, docs/perf_round3.md), because
    # the full-point inlier refit absorbs hypothesis-ranking variance.
    niter_part: int = 128
    niter_joint: int = 64
    inlier_th: float = 0.1        # reference choose_threshold
    lm_iters_hypo: int = 10
    # damped-GN refit iterations: accuracy-flat 15 -> 6 in the noise
    # sweep (ab_ransac_strength; the full-point inlier refit starts from
    # a near-optimal hypothesis)
    lm_iters_refit: int = 6
    # prefix cap on the valid-first per-part buffers (None = full N).
    # partition_by_class compacts each part's members to the front in
    # index order, so slicing to `part_points` keeps an in-order subset;
    # EXACT whenever every part holds <= part_points points (typical
    # parts hold ~N/K).  Cuts every downstream per-part cost (hypo
    # sampling, residuals, refits) from N to the cap; accuracy-neutral
    # in the noise sweep at the flagship shape (ab_ransac_strength).
    part_points: Optional[int] = 1024
    # rank hypotheses on the first `ransac_score_points` valid points of
    # each (valid-first) part buffer — exact whenever the part has that
    # many points or fewer (typical parts hold ~N/K); the winning
    # hypothesis's inlier set + refit always use all points
    ransac_score_points: Optional[int] = 1024
    # 'alternating' (closed-form Kabsch sweeps, reference isalternate
    # branch) or 'lm' (full coupled LM per hypothesis, reference default
    # branch); the winning-inlier refit is always LM.
    hypo_estimator: str = "alternating"
    use_gt_association: bool = False
    # joint j (1..n_parts-1) type; prismatic switches the LM residual
    joint_types: Tuple[str, ...] = ("revolute", "revolute")
    ransac_chunk: Optional[int] = 512
    # cap on points fed to the final joint LM refit (None = all).  The
    # part buffers are valid-first, so a prefix slice keeps an in-order
    # subset of each part's points; inlier weights are sliced with them.
    # 512 was A/B'd accuracy-identical to full-N at the flagship shape
    # (rot 4.60° / 5°5cm 0.859 both ways, docs/perf_round2.md).
    lm_refit_points: Optional[int] = 512
    # run same-type joints as ONE vmapped _joint_ransac (the base part's
    # buffers are stacked K-1 times) instead of the sequential per-joint
    # loop.  Identical results (same per-joint PRNG keys); shortens the
    # joint stage's serial kernel chain at K>=3.  (The round-2 revert of
    # a similar vmap predates the part_points cap that made the stacked
    # buffers small — re-A/B'd in round 4, see docs/perf_round4.md.)
    batch_joints: bool = False
    # part-buffer build: 'sort' (the composite-key sort carries P and the
    # K nocs planes as lax.sort value operands, then each part buffer is
    # a contiguous dynamic slice — no row gathers at all, the same
    # contiguous-copy trick that won 6.3x on the partition) or 'gather'
    # (partition_by_class + two row gathers, the round-2..4 incumbent).
    # A/B at B=64/N=2048/K=3 on v5e: masked buffers bit-identical on all
    # 64 frames, full pose fit 10.33 -> 8.46 ms (scripts/
    # ab_buffer_builds.py, docs/perf_round5.md).
    buffer_build: str = "sort"
    # joint-axis vote aggregator over the joint-associated points:
    # 'median' (the reference's robust choice, parallel_ancsh_pose.py
    # :295 — a (3, N) sort per joint, ~2 ms of the pose fit at B=64) or
    # 'mean' (one masked reduce).  Keep 'median' unless the trained-
    # checkpoint AND the 30%-flip noise A/Bs both measure flat
    # (scripts/ab_pose_knobs_trained.py / ab_ransac_strength.py).
    axis_agg: str = "median"


def partition_by_class(cls: jax.Array, n_parts: int, cap: int | None = None):
    """cls (N,) int -> (order (K, cap) valid-first index buffers, cnt (K,)).
    Fixed-size replacement for per-part np.where; cap defaults to N.

    PRECONDITION: every cls value must lie in [0, n_parts).  Out-of-range
    labels (e.g. an ignore label of -1) are clamped into range here —
    without the clamp a negative label would sort before class 0 and
    shift every row's start offset, corrupting ALL parts' buffers (not
    just its own).  Callers that carry genuine ignore labels should mask
    those points out before calling.

    Row j's first min(cnt[j], cap) entries are part j's member indices in
    ascending index order; entries beyond that are arbitrary in-range
    indices (callers mask on cnt).  ONE sort of the composite key
    (cls << ceil_log2(N)) | index groups every part's members at once
    (each class run is in index order, and masking the key back out IS
    the stable argsort — one plain sort instead of a key/value sort),
    and the K rows are dynamic slices at the class-start offsets into
    that single permutation — contiguous copies, not elementwise
    gathers — replacing K independent full-length top_k sorts.

    (An XLA butterfly-compaction variant — the routing that wins inside
    the Pallas ball-query kernel — was A/B'd here and measured WORSE,
    2.5 vs 1.9 ms at B=64, N=2048, K=3 on v5e: at XLA level the 11
    roll+select stages materialize HBM intermediates; a fused sort wins.
    The composite-key + dynamic-slice form of the sort path measured
    4.48 -> 2.63 ms in the same window — docs/perf_round4.md.)
    """
    N = cls.shape[0]
    if cap is None or cap > N:
        cap = N
    cls = jnp.clip(cls, 0, n_parts - 1)
    shift = max(1, (N - 1).bit_length())
    if (n_parts << shift) < 2**31:
        iota = jnp.arange(N, dtype=jnp.int32)
        skey = jnp.sort((cls.astype(jnp.int32) << shift) | iota)
        order_all = skey & ((1 << shift) - 1)                     # (N,)
    else:  # composite key would overflow i32: keep the key/value sort
        order_all = jnp.argsort(cls, stable=True).astype(jnp.int32)
    cnts = jnp.sum((cls[None, :] == jnp.arange(
        n_parts, dtype=cls.dtype)[:, None]).astype(jnp.int32), axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)[:-1]])
    # pad so start+cap never clamps (dynamic_slice clamps the START,
    # which would silently misalign rows whose class starts past N-cap)
    order_pad = jnp.concatenate([order_all, jnp.zeros((cap,), jnp.int32)])
    rows = jnp.stack([lax.dynamic_slice(order_pad, (starts[j],), (cap,))
                      for j in range(n_parts)])
    return rows, cnts


def build_part_buffers_sorted(nocs: jax.Array, P: jax.Array,
                              cls: jax.Array, n_parts: int, cap: int):
    """Valid-first part buffers with ZERO row gathers.

    nocs (N, 3K), P (N, 3), cls (N,) -> (src (K, cap, 3), tgt (K, cap, 3),
    mask (K, cap), cnts (K,)), identical (after masking) to the gather
    build in fit_frame.

    The composite key (cls << ceil_log2(N)) | index is sorted ONCE with
    the 3 P columns and the 3K per-part nocs columns riding along as
    lax.sort value operands; each part's buffer is then a contiguous
    dynamic slice of the sorted payload at its class-start offset.  This
    replaces the two elementwise row gathers of 2x(K*cap) rows — the
    round-4 roofline's named pose-setup residue on a chip whose
    effective gather rate probed at 0.6 GB/s (docs/roofline_r4.md) —
    with sequential copies (A/B: scripts/ab_buffer_builds.py).
    """
    N = cls.shape[0]
    K = n_parts
    cls = jnp.clip(cls, 0, K - 1)
    shift = max(1, (N - 1).bit_length())
    if (K << shift) >= 2**31:  # needs K*N >= 2^31 points — not a real shape
        raise ValueError(f"composite key overflows i32 (n_parts={K}, "
                         f"N={N}); use buffer_build='gather'")
    iota = jnp.arange(N, dtype=jnp.int32)
    ckey = (cls.astype(jnp.int32) << shift) | iota
    cols = [P[:, c] for c in range(3)]
    cols += [nocs[:, 3 * j + c] for j in range(K) for c in range(3)]
    sorted_ = lax.sort([ckey] + cols, num_keys=1)
    cnts = jnp.sum((cls[None, :] == jnp.arange(
        K, dtype=cls.dtype)[:, None]).astype(jnp.int32), axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)[:-1]])
    # pad so start+cap never clamps (see partition_by_class)
    zpad = jnp.zeros((cap,), P.dtype)
    padded = [jnp.concatenate([c, zpad]) for c in sorted_[1:]]
    mask = (jnp.arange(cap)[None, :] < cnts[:, None]).astype(P.dtype)

    def rows(colset, j):
        return jnp.stack([lax.dynamic_slice(padded[i], (starts[j],), (cap,))
                          for i in colset], axis=1)

    tgt = jnp.stack([rows(range(0, 3), j) for j in range(K)])
    src = jnp.stack([rows(range(3 + 3 * j, 6 + 3 * j), j)
                     for j in range(K)])
    return (src * mask[:, :, None], tgt * mask[:, :, None], mask, cnts)


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-column median over masked rows. x (N, C), mask (N,) -> (C,).

    Sorts along the transposed LAST axis: a (N, 3) axis-0 sort runs with
    3-lane batches on TPU, while (3, N) sorts N lanes per row.  (A
    32-step bit-lattice bisection selection was A/B'd and measured a
    wash — ~2.0 ms either way at B=64, N=2048 on v5e — the simpler sort
    stays.)
    """
    big = jnp.where(mask[None, :] > 0, x.T, jnp.inf)   # (C, N)
    v = jnp.sort(big, axis=-1)
    cnt = jnp.maximum(jnp.sum((mask > 0).astype(jnp.int32)), 1)
    lo = (cnt - 1) // 2
    hi = cnt // 2
    return (v[:, lo] + v[:, hi]) / 2.0


def vote_joint_axes(axis_pp: jax.Array, assocs: jax.Array,
                    agg: str = "median") -> jax.Array:
    """Per-joint axis vote over the joint-associated points.

    axis_pp (N, 3) per-point axis predictions, assocs (J, N) {0,1}
    association masks -> (J, 3) voted axes (reference: the per-joint
    median of parallel_ancsh_pose.py:295).  agg='median' sorts a (3, N)
    plane per joint (all J votes run as ONE vmapped sort); agg='mean'
    is a single masked reduce, normalized to unit length because a mean
    of unit vectors shrinks and the axis magnitude scales the joint-
    consistency weight in the LM (lm.py Ma rows) — the median's
    near-unit norm is what the incumbent feeds downstream.  Joints with
    no associated points fall back to +z.
    """
    if agg == "mean":
        def one(m):
            cnt = jnp.sum(m)
            v = jnp.sum(axis_pp * m[:, None], axis=0) / jnp.maximum(cnt, 1.0)
            n = jnp.linalg.norm(v)
            # empty or perfectly cancelling votes -> NaN so the +z
            # fallback below catches it (a zero vector is finite)
            return jnp.where((cnt > 0) & (n > 1e-6),
                             v / jnp.maximum(n, 1e-6), jnp.nan)
    else:
        def one(m):
            return masked_median(axis_pp, m)
    axes = jax.vmap(one)(assocs)
    return jnp.where(jnp.isfinite(axes), axes,
                     jnp.array([0.0, 0.0, 1.0])[None, :])


def _joint_ransac(key, src0, tgt0, m0, src1, tgt1, m1, jt_axis, cfg: PoseFitConfig,
                  prismatic: bool):
    """Joint-constrained RANSAC for one (base, moving-part) pair.

    Hypotheses use the closed-form alternating estimator by default
    (cfg.hypo_estimator='alternating' — the reference's isalternate
    branch, ~20× cheaper than LM per hypothesis; measured 154→8 ms for
    128 hypotheses at B=64); the final refit on the winning inlier sets
    is always the full coupled LM.
    """
    H = cfg.niter_joint
    k0, k1 = jax.random.split(key)
    # buffers from partition_by_class are valid-first -> compact draws
    idx0 = masked_sample_indices(k0, m0, (H, 3), compact=True)
    idx1 = masked_sample_indices(k1, m1, (H, 3), compact=True)
    ones3 = jnp.ones((3,), src0.dtype)

    def hypo_fit(i0, i1):
        if cfg.hypo_estimator == "alternating":
            return joint_transformation_estimate_alt(
                src0[i0], tgt0[i0], ones3, src1[i1], tgt1[i1], ones3,
                jt_axis, sweeps=3, prismatic=prismatic)
        return joint_transformation_estimate(
            src0[i0], tgt0[i0], ones3, src1[i1], tgt1[i1], ones3,
            jt_axis, lm_iters=cfg.lm_iters_hypo, prismatic=prismatic)

    fits = jax.vmap(hypo_fit)(idx0, idx1)                  # JointFit of (H, ...)

    from articulated_pose_tpu.pose.ransac import hypothesis_inlier_counts

    # inlier COUNTS via the (H,16)@(16,P) matmul form (no (H,P,3)
    # intermediate); the best hypothesis's inlier SET is recomputed for
    # that single h below.  Ranking uses the valid-first score prefix
    # (see PoseFitConfig.ransac_score_points) — denominators use the
    # same prefix so the mean-inlier-ratio comparison stays consistent.
    sp = cfg.ransac_score_points
    sp = sp if (sp is not None and sp < src0.shape[0]) else src0.shape[0]
    c0 = hypothesis_inlier_counts(fits.R0, fits.s0, fits.t0, src0[:sp],
                                  tgt0[:sp], m0[:sp] > 0, cfg.inlier_th)
    c1 = hypothesis_inlier_counts(fits.R1, fits.s1, fits.t1, src1[:sp],
                                  tgt1[:sp], m1[:sp] > 0, cfg.inlier_th)
    # mean inlier ratio over both parts (parallel_ancsh_pose.py:186-194)
    frac0 = c0 / jnp.maximum(jnp.sum(m0[:sp]), 1.0)
    frac1 = c1 / jnp.maximum(jnp.sum(m1[:sp]), 1.0)
    scores = (frac0 + frac1) / 2.0
    best = jnp.argmax(scores)

    def inliers_one(R, s, t, src, tgt, m):
        res = umeyama.similarity_residual(R, s, t, src, tgt)
        return (res < cfg.inlier_th) & (m > 0)

    bi0 = inliers_one(fits.R0[best], fits.s0[best], fits.t0[best],
                      src0, tgt0, m0)
    bi1 = inliers_one(fits.R1[best], fits.s1[best], fits.t1[best],
                      src1, tgt1, m1)
    w0 = jnp.where(jnp.sum(bi0) >= 3, bi0, m0 > 0).astype(src0.dtype)
    w1 = jnp.where(jnp.sum(bi1) >= 3, bi1, m1 > 0).astype(src1.dtype)
    cap = cfg.lm_refit_points
    if cap is not None and cap < src0.shape[0]:
        src0, tgt0, w0 = src0[:cap], tgt0[:cap], w0[:cap]
        src1, tgt1, w1 = src1[:cap], tgt1[:cap], w1[:cap]
    fit = joint_transformation_estimate(
        src0, tgt0, w0, src1, tgt1, w1, jt_axis,
        lm_iters=cfg.lm_iters_refit, prismatic=prismatic)
    return fit, scores[best]


def fit_frame(pred: Dict[str, jax.Array], P: jax.Array, key: jax.Array,
              cfg: PoseFitConfig,
              joint_cls_gt: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Fit all part poses for one frame.

    pred: per-point predictions (W (N,K), nocs_per_point (N,3K),
    joint_axis_per_point (N,3), index_per_point (N,K));
    P (N, 3) input cloud.  Returns dict with stacked per-part
    baseline/nonlinear (R (K,3,3), s (K,), t (K,3)).
    """
    K = cfg.n_parts
    N = P.shape[0]
    cls = jnp.argmax(pred["W"], axis=-1)

    # stacked valid-first part buffers: one gather each instead of K.
    # The buffers are built at the cfg.part_points prefix (exact for
    # parts holding that many points or fewer; see the config docstring)
    # so all downstream per-part work runs at the cap, not N.
    cap = cfg.part_points
    if cap is None or cap > N:
        cap = N
    if cfg.buffer_build == "sort":
        src_all, tgt_all, mask_all, cnts = build_part_buffers_sorted(
            pred["nocs_per_point"], P, cls, K, cap)
    else:
        orders_c, cnts = partition_by_class(cls, K, cap=cap)
        iota_c = jnp.arange(cap)
        mask_all = (iota_c[None, :] < cnts[:, None]).astype(P.dtype)  # (K, cap)
        nocs_parts = jnp.transpose(
            pred["nocs_per_point"].reshape(N, K, 3), (1, 0, 2))      # (K, N, 3)
        src_all = jnp.take_along_axis(nocs_parts, orders_c[:, :, None], axis=1)
        src_all = src_all * mask_all[:, :, None]
        tgt_all = P[orders_c] * mask_all[:, :, None]                 # (K, cap, 3)
    srcs = [src_all[j] for j in range(K)]
    tgts = [tgt_all[j] for j in range(K)]
    masks = [mask_all[j] for j in range(K)]

    # ---- per-part baseline RANSAC: vmapped over the K parts -------------
    # (same per-part PRNG keys as the former python loop -> identical fits)
    keys = jax.random.split(key, K + (K - 1))
    fits = jax.vmap(
        lambda k, s, t, m: ransac_similarity(
            k, s, t, m, niter=cfg.niter_part, inlier_th=cfg.inlier_th,
            chunk=cfg.ransac_chunk, compact_mask=True,
            score_points=cfg.ransac_score_points))(
        keys[:K], src_all, tgt_all, mask_all)
    base_R = [fits.R[j] for j in range(K)]
    base_s = [fits.s[j] for j in range(K)]
    base_t = [fits.t[j] for j in range(K)]

    out = {
        "baseline_R": fits.R,
        "baseline_s": fits.s,
        "baseline_t": fits.t,
    }

    # ---- joint-constrained nonlinear fits -------------------------------
    if "joint_axis_per_point" in pred:
        # base part NOCS head is part 0's slice (parallel_ancsh_pose.py:291)
        # All K-1 joint-axis medians run as ONE vmapped sort: each median
        # sorts a (3, N) plane, so batching the joints fills the sublane
        # dimension instead of issuing K-1 narrow sorts sequentially.
        if cfg.use_gt_association and joint_cls_gt is not None:
            assoc_cls = joint_cls_gt
        else:
            assoc_cls = jnp.argmax(pred["index_per_point"], -1)
        if K > 1:
            assocs = jnp.stack(
                [(assoc_cls == j).astype(P.dtype) for j in range(1, K)])
            axes = vote_joint_axes(pred["joint_axis_per_point"], assocs,
                                   cfg.axis_agg)           # (K-1, 3)

        def joint_axis_for(j):
            return axes[j - 1]

        nl_R = [None] * K
        nl_s = [None] * K
        nl_t = [None] * K
        if cfg.batch_joints and K > 2:
            # same-type joints run as ONE vmapped _joint_ransac over the
            # joint axis (base-part buffers stacked per joint) — K-1
            # sequential solves collapse into ceil(#types) batched ones.
            # Same per-joint PRNG keys as the loop -> identical fits.
            # (A round-2 vmap attempt measured WORSE pre-part_points-cap,
            # docs/perf_round2.md; re-A/B'd in round 4 at the capped
            # buffers, docs/perf_round4.md.)
            by_type: Dict[bool, list] = {}
            for j in range(1, K):
                by_type.setdefault(
                    cfg.joint_types[j - 1] == "prismatic", []).append(j)
            for prismatic, js in by_type.items():
                jkeys = jnp.stack([keys[K + j - 1] for j in js])
                s1 = jnp.stack([srcs[j] for j in js])
                t1 = jnp.stack([tgts[j] for j in js])
                m1 = jnp.stack([masks[j] for j in js])
                ax = jnp.stack([joint_axis_for(j) for j in js])
                fit, _ = jax.vmap(
                    lambda k, s, t, m, a: _joint_ransac(
                        k, srcs[0], tgts[0], masks[0], s, t, m, a, cfg,
                        prismatic))(jkeys, s1, t1, m1, ax)
                for i, j in enumerate(js):
                    if nl_R[0] is None:  # part 0 from the first solve
                        nl_R[0], nl_s[0], nl_t[0] = (fit.R0[i], fit.s0[i],
                                                     fit.t0[i])
                    nl_R[j], nl_s[j], nl_t[j] = (fit.R1[i], fit.s1[i],
                                                 fit.t1[i])
        else:
            for j in range(1, K):
                prismatic = cfg.joint_types[j - 1] == "prismatic"
                fit, _ = _joint_ransac(
                    keys[K + j - 1], srcs[0], tgts[0], masks[0],
                    srcs[j], tgts[j], masks[j], joint_axis_for(j), cfg,
                    prismatic)
                if nl_R[0] is None:  # part 0 from first joint solve (:331)
                    nl_R[0], nl_s[0], nl_t[0] = fit.R0, fit.s0, fit.t0
                nl_R[j], nl_s[j], nl_t[j] = fit.R1, fit.s1, fit.t1
        if nl_R[0] is None:
            nl_R[0], nl_s[0], nl_t[0] = base_R[0], base_s[0], base_t[0]
        out.update({
            "nonlinear_R": jnp.stack(nl_R),
            "nonlinear_s": jnp.stack(nl_s),
            "nonlinear_t": jnp.stack(nl_t),
        })

    out["part_counts"] = cnts
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_frame_batch(pred: Dict[str, jax.Array], P: jax.Array, key: jax.Array,
                    cfg: PoseFitConfig,
                    joint_cls_gt: Optional[jax.Array] = None):
    """vmap of fit_frame over the leading batch axis."""
    B = P.shape[0]
    keys = jax.random.split(key, B)
    if joint_cls_gt is None:
        return jax.vmap(lambda p, x, k: fit_frame(p, x, k, cfg))(pred, P, keys)
    return jax.vmap(lambda p, x, k, jc: fit_frame(p, x, k, cfg, jc))(
        pred, P, keys, joint_cls_gt)
