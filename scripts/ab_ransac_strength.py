"""Accuracy A/B: pose-fit quality vs RANSAC hypothesis count.

Builds noisy-oracle predictions (GT labels + calibrated noise matching a
trained model's error profile: NOCS jitter, segmentation flips, axis
jitter) on synthetic frames with exact GT poses, then fits with several
PoseFitConfig strengths and reports rot/trans/5°5cm per config.  Run on
CPU; the decision feeds PoseFitConfig defaults (a weaker-but-equal
config is free throughput).

JAX_PLATFORMS=cpu python scripts/ab_ransac_strength.py --frames 64
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--nocs_noise", type=float, default=0.02)
    ap.add_argument("--seg_flip", type=float, default=0.05)
    ap.add_argument("--r4", action="store_true",
                    help="round-4 arms: probe knobs BELOW the production "
                         "defaults (refit 3, 64/32 hypos, smaller scoring/"
                         "refit prefixes) for further free throughput")
    ap.add_argument("--arms", default=None,
                    help="comma list of substrings: run only --r4 arms "
                         "whose tag matches (plus the control); each arm "
                         "is a separate XLA compile, so filtering pays "
                         "on slow hosts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch
    from articulated_pose_tpu.utils import transforms as tr

    K = 3
    gen = SyntheticArticulated(n_parts=K, points_per_part=400,
                               joint_types=("revolute", "revolute"), seed=3)
    rng = np.random.RandomState(1)
    frames, gts = [], []
    for _ in range(args.frames):
        s, g = gen.frame(rng, num_points=args.points, n_max_parts=K)
        frames.append(s)
        gts.append(g)

    # noisy-oracle predictions
    preds = {"W": [], "nocs_per_point": [], "joint_axis_per_point": [],
             "index_per_point": []}
    for s in frames:
        N = s["P"].shape[0]
        cls = s["cls_gt"].astype(int)
        flip = rng.rand(N) < args.seg_flip
        cls_noisy = np.where(flip, rng.randint(0, K, N), cls)
        W = np.eye(K, dtype=np.float32)[cls_noisy]
        nocs = np.zeros((N, 3 * K), np.float32)
        for j in range(K):
            sel = cls_noisy == j
            nocs[sel, 3 * j:3 * (j + 1)] = (
                s["nocs_gt"][sel] + args.nocs_noise * rng.randn(sel.sum(), 3))
        axis = (s["orient_gt"] + 0.05 * rng.randn(N, 3)).astype(np.float32)
        index = np.eye(K, dtype=np.float32)[s["joint_cls_gt"].astype(int) % K]
        preds["W"].append(W)
        preds["nocs_per_point"].append(nocs.astype(np.float32))
        preds["joint_axis_per_point"].append(axis)
        preds["index_per_point"].append(index)
    pred = {k: jnp.asarray(np.stack(v)) for k, v in preds.items()}
    P = jnp.asarray(np.stack([s["P"] for s in frames]))
    key = jax.random.PRNGKey(0)

    def evaluate(cfg, tag):
        out = jax.device_get(fit_frame_batch(pred, P, key, cfg))
        rots, trans, acc = [], [], []
        for i, g in enumerate(gts):
            for j in range(K):
                s_, R_, t_ = tr.decompose_similarity(g.rt_nocs2cam[j])
                Rp = out["nonlinear_R"][i, j]
                tp = out["nonlinear_t"][i, j]
                if not np.all(np.isfinite(Rp)):
                    continue
                r = tr.rot_diff_degree(Rp, R_)
                d = float(np.linalg.norm(tp - t_))
                rots.append(r)
                trans.append(d)
                acc.append(float(r < 5 and d < 0.05))
        print(f"{tag:<44s} rot {np.mean(rots):6.2f}°  med {np.median(rots):5.2f}°"
              f"  trans {np.mean(trans):7.4f}  5°5cm {np.mean(acc):.3f}",
              flush=True)

    base = dict(n_parts=K, joint_types=("revolute", "revolute"),
                lm_iters_hypo=8, lm_iters_refit=15, ransac_chunk=None,
                lm_refit_points=512)

    if args.r4:
        prod = dict(base, lm_iters_refit=6)
        evaluate(PoseFitConfig(niter_part=128, niter_joint=64, **prod),
                 "PROD 128/64 refit6 (control)")
        wanted = (args.arms.split(",") if args.arms else None)
        for kw, tag in [
            (dict(lm_iters_refit=4), "refit=4"),
            (dict(lm_iters_refit=3), "refit=3"),
            (dict(lm_iters_refit=2), "refit=2"),
            (dict(niter_part=64), "niter_part=64"),
            (dict(niter_joint=32), "niter_joint=32"),
            (dict(niter_part=64, niter_joint=32, lm_iters_refit=3),
             "64/32 refit=3 (all cheap)"),
            (dict(ransac_score_points=512), "score_points=512"),
            (dict(ransac_score_points=256), "score_points=256"),
            (dict(lm_refit_points=256), "lm_refit_points=256"),
            (dict(part_points=512), "part_points=512"),
            (dict(axis_agg="mean"), "axis_agg=mean"),
            (dict(niter_part=64, niter_joint=32, lm_iters_refit=3,
                  ransac_score_points=512, axis_agg="mean"),
             "64/32 refit3 score512 mean (all cheap+mean)"),
        ]:
            if wanted is not None and not any(w in tag for w in wanted):
                continue
            b = dict(prod, niter_part=128, niter_joint=64)
            b.update(kw)
            evaluate(PoseFitConfig(**b), f"R4 {tag}")
        return
    for niter_part, niter_joint in [(2048, 256), (1024, 128), (512, 128),
                                    (256, 64), (128, 64)]:
        evaluate(PoseFitConfig(niter_part=niter_part,
                               niter_joint=niter_joint, **base),
                 f"niter_part={niter_part} niter_joint={niter_joint}")
    for refit_iters in (15, 10, 6):
        b = dict(base)
        b["lm_iters_refit"] = refit_iters
        evaluate(PoseFitConfig(niter_part=512, niter_joint=128, **b),
                 f"lm_iters_refit={refit_iters} (512/128)")

    # strongest config with NO part-buffer cap vs the production default
    # (128/64, refit 6, part_points prefix cap)
    strong = dict(base)
    strong["part_points"] = None
    evaluate(PoseFitConfig(niter_part=2048, niter_joint=256, **strong),
             "STRONG 2048/256 refit15 no-cap")
    prod = dict(base)
    prod["lm_iters_refit"] = 6
    for cap in (None, 1024, 768):
        b = dict(prod)
        b["part_points"] = cap
        evaluate(PoseFitConfig(niter_part=128, niter_joint=64, **b),
                 f"PROD 128/64 refit6 part_points={cap}")


if __name__ == "__main__":
    main()
