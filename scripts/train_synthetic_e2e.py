"""End-to-end validation: train ANCSH on synthetic data, fit poses, eval.

Everything runs ON DEVICE: frames are generated inside the compiled train
step (data/device_synthetic.py — the dev tunnel's ~10 MB/s H2D made host
feeding the bottleneck), the held-out evaluation frames are generated on
device too, and the pose stage is the vmapped RANSAC+LM program.  Reports
the reference metrics (per-part rotation/translation error, 5°5cm,
3D mIoU) against exact GT poses.

Usage: python scripts/train_synthetic_e2e.py [--steps 6000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--test-frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--parts", type=int, default=3)
    ap.add_argument("--joint-types", default=None,
                    help="comma list, e.g. prismatic,prismatic,prismatic")
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=0,
                    help="procedural-generator seed (distinct seeds = "
                         "distinct category instances; the 5-category "
                         "sweep gives each category its own)")
    ap.add_argument("--category", default=None,
                    help="registry category name recorded in the report "
                         "(and source of parts/joint_types if --parts is "
                         "not given explicitly)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--full-rotation", action="store_true",
                    help="uniform SO(3) cameras (harder; default is the "
                         "reference renderer's yaw/pitch band)")
    ap.add_argument("--work", default="/tmp/ancsh_synth_e2e")
    ap.add_argument("--lm-refit-points", type=int, default=None,
                    help="cap points fed to the joint LM refit (A/B the "
                         "PoseFitConfig.lm_refit_points knob)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="backbone compute dtype (A/B the MXU bf16 path)")
    ap.add_argument("--head-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="output-head dtype override (mixed-precision "
                         "diagnosis: bf16 trunk + f32 heads)")
    ap.add_argument("--f32-stages", default=None,
                    help="comma-separated backbone stages pinned to f32 "
                         "under a bf16 trunk (e.g. 'sa1' — the gradient-"
                         "bisect fix for the bf16 collapse)")
    ap.add_argument("--packed-ballq", action="store_true",
                    help="packed butterfly ball query (quantized grouped "
                         "coords; A/B the ball_query_packed config knob)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.device_synthetic import (
        DeviceSynthetic, make_fused_synthetic_train_step)
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.eval.pipeline import (compute_gt_poses,
                                                    evaluate_fits,
                                                    gt_joint_lines,
                                                    joint_errors,
                                                    pred_joint_lines)
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch
    from articulated_pose_tpu.train.state import create_train_state, make_eval_step

    K = args.parts
    if args.category and "--parts" not in sys.argv[1:]:
        from articulated_pose_tpu.registry import get_category
        spec = get_category(args.category)
        K = spec.n_parts
        if not args.joint_types:
            args.joint_types = ",".join(spec.joint_types)
    if args.joint_types:
        joint_types = tuple(args.joint_types.split(","))
        assert len(joint_types) == K - 1, "need n_parts-1 joint types"
    else:
        joint_types = tuple(["revolute"] * (K - 1))
    cfg = NetworkConfig(n_max_parts=K, num_points=args.points,
                        batch_size=args.batch, init_learning_rate=args.lr,
                        decay_step=10**8, bn_decay_step=10**8,
                        val_interval=0, snapshot_interval=0,
                        compute_dtype=args.dtype,
                        head_compute_dtype=args.head_dtype,
                        f32_stages=(tuple(s.strip() for s in
                                          args.f32_stages.split(","))
                                    if args.f32_stages else ()),
                        ball_query_packed=args.packed_ballq)
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=args.seed,
                               full_rotation=args.full_rotation)
    dg = DeviceSynthetic(gen, num_points=args.points, noise=args.noise)

    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               np.zeros((1, args.points, 3), np.float32))
    from articulated_pose_tpu.train.trainer import Checkpointer
    ck = Checkpointer(os.path.join(args.work, "model"))
    if args.resume and ck.latest_step() is not None:
        state = ck.restore(state)
        print(f"resumed from step {int(state.step)}", flush=True)
    window = max(1, args.steps_per_call)
    fused_step = make_fused_synthetic_train_step(cfg, dg, args.batch,
                                                 steps_per_call=window)
    key = jax.random.PRNGKey(1)

    print(f"training (fused on-device data gen, {window} steps/dispatch)...",
          flush=True)
    t0 = time.time()
    metrics = None
    step0 = step = int(state.step)
    # mid-train snapshots: a dev-tunnel stall kills dispatches that run
    # for tens of minutes, so never put more than ~snapshot_every steps
    # at risk (--resume picks up from the last snapshot)
    snapshot_every = 4000
    last_snap = step
    while step < args.steps:
        state, metrics = fused_step(state, key)
        step += window
        if step % 500 < window:
            m = {k: round(float(np.asarray(v)), 4)
                 for k, v in metrics.items() if k != "grads_finite"}
            print(f"step {step}: {json.dumps(m)}", flush=True)
        if step - last_snap >= snapshot_every and step < args.steps:
            ck.save(step, state)
            last_snap = step
    jax.block_until_ready(metrics)
    train_s = time.time() - t0
    print(f"trained {step - step0} steps in {train_s:.1f}s "
          f"({(step - step0) * args.batch / train_s:.0f} clouds/s)",
          flush=True)

    ck.save(step, state)
    print("checkpointed to", args.work, flush=True)

    # ---- held-out eval: device-generated frames with exact GT -----------
    eval_step = make_eval_step(cfg)
    pose_cfg = PoseFitConfig(n_parts=K, niter_part=1024, niter_joint=128,
                             joint_types=joint_types, lm_iters_hypo=8,
                             lm_iters_refit=15, ransac_chunk=None,
                             lm_refit_points=args.lm_refit_points)
    fits, gts = [], []
    nocs_pred_l, nocs_gt_l, cls_l, seg_acc = [], [], [], []
    gts_global, P_l, cls_pred_l = [], [], []
    joint_errs = []
    ek = jax.random.PRNGKey(9999)
    sample_batch = jax.jit(lambda k, n: dg.sample_batch(k, n),
                           static_argnums=1)
    for lo in range(0, args.test_frames, args.batch):
        n = min(args.batch, args.test_frames - lo)
        ek, k1, k2 = jax.random.split(ek, 3)
        batch, gt = sample_batch(k1, n)
        pred, _ = eval_step(state, batch)
        out = fit_frame_batch(
            {kk: pred[kk] for kk in ("W", "nocs_per_point",
                                     "joint_axis_per_point",
                                     "index_per_point")},
            batch["P"], k2, pose_cfg)
        batch, gt, pred, out = jax.device_get((batch, gt, pred, out))
        seg_acc.append((np.argmax(pred["W"], -1) ==
                        batch["cls_gt"].astype(int)).mean())
        for i in range(n):
            fits.append({"R": out["nonlinear_R"][i], "s": out["nonlinear_s"][i],
                         "t": out["nonlinear_t"][i]})
            gts.append({"R": list(gt["R"][i]), "s": list(gt["s"][i]),
                        "t": list(gt["t"][i])})
            nocs_pred_l.append(pred["nocs_per_point"][i])
            nocs_gt_l.append(batch["nocs_gt"][i])
            cls_l.append(batch["cls_gt"][i].astype(int))
            # GT GLOBAL-NOCS poses for the relative inter-part metrics
            # (reference eval_pose_err.py:307-335: rel rotation from the
            # part-NOCS GT pair, rel translation from the NAOCS GT pair
            # + part-boundary trick on the predictions)
            gg = compute_gt_poses(batch["nocs_gt_g"][i], batch["P"][i],
                                  batch["cls_gt"][i].astype(int), K)
            gts_global.append({
                kk: [None if e is None else e[kk] for e in gg]
                for kk in ("R", "s", "t")})
            P_l.append(batch["P"][i])
            cls_pred_l.append(np.argmax(pred["W"][i], -1))
            # joint-parameter metrics (eval_joint_params.py protocol)
            if "gocs_per_point" in pred:
                base_fit = {"R": out["nonlinear_R"][i][0],
                            "s": out["nonlinear_s"][i][0],
                            "t": out["nonlinear_t"][i][0]}
                fp = {kk: np.asarray(vv[i]) for kk, vv in pred.items()}
                fb = {kk: np.asarray(vv[i]) for kk, vv in batch.items()}
                pl = pred_joint_lines(fp, base_fit, K)
                gl = gt_joint_lines(fb, batch["P"][i], K)
                for a, b in zip(pl, gl):
                    if a is not None and b is not None:
                        joint_errs.append(joint_errors(a, b["axis"],
                                                       b["point"]))

    report = evaluate_fits(fits, gts, K, nocs_pred=nocs_pred_l,
                           nocs_gt=nocs_gt_l, cls_list=cls_l, miou_nres=30,
                           gts_global=gts_global, P_list=P_l,
                           cls_pred_list=cls_pred_l)
    print(f"seg accuracy: {np.mean(seg_acc):.4f}", flush=True)
    print(report.summary(), flush=True)
    if joint_errs:
        report.overall["joint_axis_err_deg"] = float(
            np.mean([e["axis_err_deg"] for e in joint_errs]))
        report.overall["joint_line_dist"] = float(
            np.mean([e["line_dist"] for e in joint_errs]))
        print(f"joints: axis err {report.overall['joint_axis_err_deg']:.2f}° "
              f"line dist {report.overall['joint_line_dist']:.4f} "
              f"({len(joint_errs)} joints)", flush=True)
    if report.per_joint:
        for j, stats in enumerate(report.per_joint):
            parts = [f"{kk}={vv:.4f}" for kk, vv in stats.items()
                     if kk.endswith("mean")]
            print(f"joint {j + 1} ({joint_types[j]}): "
                  + " ".join(parts), flush=True)
    os.makedirs(args.work, exist_ok=True)
    with open(os.path.join(args.work, "report.json"), "w") as f:
        json.dump({"per_part": report.per_part, "overall": report.overall,
                   "per_joint": report.per_joint,
                   "seg_acc": float(np.mean(seg_acc)),
                   "category": args.category, "seed": args.seed,
                   "n_parts": K, "joint_types": list(joint_types),
                   "compute_dtype": args.dtype,
                   "train_steps": args.steps, "train_seconds": train_s,
                   "train_clouds_per_sec": args.steps * args.batch / train_s},
                  f, indent=1)
    print("wrote", os.path.join(args.work, "report.json"))


if __name__ == "__main__":
    main()
