"""Trained-model A/B of PoseFitConfig knobs (round 4).

The noise-model sweep (ab_ransac_strength.py --r4) says refit 6->3,
niter_part 128->64 and ransac_score_points 1024->512 are accuracy-flat
at 30% seg flips + 0.06 NOCS noise.  This validates the same arms on a
REAL trained checkpoint (e.g. the 5-category sweep's eyeglasses run),
paired on identical device-generated test frames — the decision
protocol that set the current defaults in round 3.

  python scripts/ab_pose_knobs_trained.py --work /tmp/e2e_sweep_eyeglasses \
      --category eyeglasses --seed 1
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=None,
                    help="checkpoint dir to restore (same-chip-epoch "
                         "only: see --train-steps)")
    ap.add_argument("--train-steps", type=int, default=0,
                    help="if >0, TRAIN in-process for this many steps "
                         "(sweep recipe) instead of restoring --work. "
                         "Round-5 finding: checkpoints written before a "
                         "tunnel wedge/recovery evaluate degraded in a "
                         "fresh process (eyeglasses 0.9645 -> 0.68 seg "
                         "on same-key frames) while same-process and "
                         "same-epoch round-trips are bit-exact — so the "
                         "A/B trains and measures in ONE process")
    ap.add_argument("--category", default="eyeglasses")
    ap.add_argument("--seed", type=int, default=1,
                    help="must match the generator seed of the training run")
    ap.add_argument("--test-frames", type=int, default=192)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--time-iters", type=int, default=0,
                    help="if >0, also time each arm's fit_frame_batch in "
                    "a fused scan window of this many iterations (chip "
                    "milliseconds alongside the accuracy table)")
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.device_synthetic import DeviceSynthetic
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.eval.pipeline import evaluate_fits
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch)
    from articulated_pose_tpu.registry import get_category
    from articulated_pose_tpu.train.state import (create_train_state,
                                                  make_eval_step)
    from articulated_pose_tpu.train.trainer import Checkpointer

    spec = get_category(args.category)
    K = spec.n_parts
    joint_types = tuple(spec.joint_types)
    cfg = NetworkConfig(n_max_parts=K, num_points=args.points,
                        batch_size=args.batch, init_learning_rate=1e-3,
                        decay_step=10**8, bn_decay_step=10**8,
                        val_interval=0, snapshot_interval=0)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               np.zeros((1, args.points, 3), np.float32))
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=args.seed)
    dg = DeviceSynthetic(gen, num_points=args.points, noise=args.noise)
    if args.train_steps > 0:
        import time as _time

        from articulated_pose_tpu.data.device_synthetic import (
            make_fused_synthetic_train_step)
        fused = make_fused_synthetic_train_step(cfg, dg, args.batch,
                                                steps_per_call=25)
        tkey = jax.random.PRNGKey(1)
        t0 = _time.time()
        metrics = None
        while int(state.step) < args.train_steps:
            state, metrics = fused(state, tkey)
        jax.block_until_ready(metrics)
        print(f"trained {int(state.step)} steps in-process "
              f"({_time.time() - t0:.0f}s)", flush=True)
    else:
        assert args.work, "need --work or --train-steps"
        ck = Checkpointer(os.path.join(args.work, "model"))
        assert ck.latest_step() is not None, f"no checkpoint under {args.work}"
        state = ck.restore(state)
        print(f"restored step {int(state.step)} from {args.work}",
              flush=True)
    eval_step = make_eval_step(cfg)
    sample_batch = jax.jit(lambda k, n: dg.sample_batch(k, n),
                           static_argnums=1)

    # network predictions once; every arm reuses them (paired frames)
    ek = jax.random.PRNGKey(9999)
    batches, preds, gts = [], [], []
    for lo in range(0, args.test_frames, args.batch):
        n = min(args.batch, args.test_frames - lo)
        ek, k1, _ = jax.random.split(ek, 3)
        batch, gt = sample_batch(k1, n)
        pred, _ = eval_step(state, batch)
        batches.append(batch)
        preds.append(pred)
        gts.append(jax.device_get(gt))

    # guard: garbage predictions mean every arm below measures nothing
    # (this caught the round-5 checkpoint-save corruption: all arms sat
    # at rot ~117° because the restored net segmented at 0.68)
    seg = float(np.mean([
        (np.argmax(np.asarray(p["W"]), -1)
         == np.asarray(b["cls_gt"]).astype(int)).mean()
        for p, b in zip(preds, batches)]))
    print(f"prediction seg acc {seg:.4f} (expect ~the training run's "
          "eval; if far below, the checkpoint does not match this "
          "generator/seed)", flush=True)

    def time_arm(tag, pcfg):
        """ms/batch for fit_frame_batch in one fused scan window (the
        bench.py discipline: the dev tunnel's per-dispatch latency
        swings too much for multi-dispatch timing)."""
        batch0, pred0 = batches[0], preds[0]
        inp = {kk: pred0[kk] for kk in ("W", "nocs_per_point",
                                        "joint_axis_per_point",
                                        "index_per_point")}

        @jax.jit
        def window(inp, P, key):
            def body(acc, i):
                k = jax.random.fold_in(key, i)
                inp_i = jax.tree.map(
                    lambda a: a + (1e-30 * acc).astype(a.dtype), inp)
                out = fit_frame_batch(inp_i, P, k, pcfg)
                return acc + jnp.sum(out["nonlinear_s"]
                                     .astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32),
                                  jnp.arange(args.time_iters))
            return acc

        kt = jax.random.PRNGKey(11)
        _ = float(window(inp, batch0["P"], kt))       # compile + warm
        t0 = time.perf_counter()
        _ = float(window(inp, batch0["P"], kt))
        dt = (time.perf_counter() - t0) / args.time_iters
        print(f"  [{tag}] pose fit {dt*1e3:8.3f} ms/batch "
              f"(B={batch0['P'].shape[0]}, {args.time_iters} fused iters)",
              flush=True)

    def arm(tag, **kw):
        base = dict(n_parts=K, joint_types=joint_types, ransac_chunk=None)
        base.update(kw)
        pcfg = PoseFitConfig(**base)
        if args.time_iters > 0:
            time_arm(tag, pcfg)
        fits, gt_l = [], []
        fk = jax.random.PRNGKey(7)
        for batch, pred, gt in zip(batches, preds, gts):
            fk, k2 = jax.random.split(fk)
            out = fit_frame_batch(
                {kk: pred[kk] for kk in ("W", "nocs_per_point",
                                         "joint_axis_per_point",
                                         "index_per_point")},
                batch["P"], k2, pcfg)
            out = jax.device_get(out)
            n = batch["P"].shape[0]
            for i in range(n):
                fits.append({"R": out["nonlinear_R"][i],
                             "s": out["nonlinear_s"][i],
                             "t": out["nonlinear_t"][i]})
                gt_l.append({"R": list(gt["R"][i]), "s": list(gt["s"][i]),
                             "t": list(gt["t"][i])})
        rep = evaluate_fits(fits, gt_l, K)
        o = rep.overall
        print(f"{tag:<40s} rot {o['rot_err_deg_mean']:6.2f}° "
              f"trans {o['trans_err_mean']:7.4f} "
              f"5°5cm {o['acc_5deg5cm']:.3f}", flush=True)

    arm("production control (128/64 refit6)",
        niter_part=128, niter_joint=64)
    arm("refit=3", niter_part=128, niter_joint=64, lm_iters_refit=3)
    arm("niter_part=64", niter_part=64, niter_joint=64)
    arm("score_points=512", niter_part=128, niter_joint=64,
        ransac_score_points=512)
    arm("axis_agg=mean", niter_part=128, niter_joint=64, axis_agg="mean")
    arm("ALL cheap (64/64 refit3 score512)",
        niter_part=64, niter_joint=64, lm_iters_refit=3,
        ransac_score_points=512)
    arm("ALL cheap + axis mean",
        niter_part=64, niter_joint=64, lm_iters_refit=3,
        ransac_score_points=512, axis_agg="mean")
    arm("STRONG (1024/128 refit15)",
        niter_part=1024, niter_joint=128, lm_iters_hypo=8,
        lm_iters_refit=15)


if __name__ == "__main__":
    main()
