"""End-to-end validation: train ANCSH on synthetic data, fit poses, eval.

Trains the full-size model on procedurally generated articulated objects
(exact GT available), runs the on-device pose stage on a held-out set,
and reports the reference metrics (per-part rotation/translation error,
5°5cm, 3D mIoU).  This is the integration proof that the whole stack —
ops → backbone → heads → losses → train step → RANSAC/LM pose fit →
eval — learns and recovers poses.

Usage: python scripts/train_synthetic_e2e.py [--steps 2000] [--frames 512]
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--test-frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--parts", type=int, default=3)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--full-rotation", action="store_true",
                    help="uniform SO(3) cameras (harder; default is the "
                         "reference renderer's yaw/pitch band)")
    ap.add_argument("--work", default="/tmp/ancsh_synth_e2e")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.batcher import BatchIterator, device_prefetch
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.eval.pipeline import evaluate_fits
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch
    from articulated_pose_tpu.train.state import (
        create_train_state, make_eval_step, make_train_step)
    from articulated_pose_tpu.utils import transforms as tr

    K = args.parts
    joint_types = tuple(["revolute"] * (K - 1))
    cfg = NetworkConfig(n_max_parts=K, num_points=args.points,
                        batch_size=args.batch, init_learning_rate=args.lr,
                        decay_step=10**8, bn_decay_step=10**8,
                        val_interval=0, snapshot_interval=0)
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=0,
                               full_rotation=args.full_rotation)

    from articulated_pose_tpu.data.batcher import StreamingIterator

    print("generating data (streaming)...", flush=True)
    data = StreamingIterator(
        lambda rng: gen.frame(rng, num_points=args.points,
                              noise=args.noise)[0],
        batch_size=args.batch, batches_per_epoch=100, seed=0)

    rng_test = np.random.RandomState(10_000)
    test = [gen.frame(rng_test, num_points=args.points, noise=args.noise)
            for _ in range(args.test_frames)]

    example = gen.frame(np.random.RandomState(1), num_points=args.points)[0]
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               example["P"][None])
    train_step = make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(1)

    print("training...", flush=True)
    t0 = time.time()
    step = 0
    while step < args.steps:
        for batch in device_prefetch(data, size=2):
            state, metrics = train_step(state, batch, rng)
            step += 1
            if step % 200 == 0 or step == 1:
                m = {k: round(float(np.asarray(v)), 4)
                     for k, v in metrics.items() if k != "grads_finite"}
                print(f"step {step}: {json.dumps(m)}", flush=True)
            if step >= args.steps:
                break
    train_s = time.time() - t0
    print(f"trained {step} steps in {train_s:.1f}s "
          f"({step * args.batch / train_s:.0f} clouds/s)", flush=True)

    # ---- predict + pose fit + eval on held-out frames -------------------
    eval_step = make_eval_step(cfg)
    pose_cfg = PoseFitConfig(n_parts=K, niter_part=1024, niter_joint=128,
                             joint_types=joint_types, lm_iters_hypo=8,
                             lm_iters_refit=15, ransac_chunk=256)
    fits, gts = [], []
    nocs_pred_l, nocs_gt_l, cls_l = [], [], []
    seg_acc = []
    key = jax.random.PRNGKey(2)
    for lo in range(0, args.test_frames, args.batch):
        chunk = test[lo:lo + args.batch]
        batch = {k: np.stack([s[k] for s, _ in chunk]) for k in chunk[0][0]}
        pred, _ = eval_step(state, batch)
        pred = jax.device_get(pred)
        seg_acc.append((np.argmax(pred["W"], -1) ==
                        batch["cls_gt"].astype(int)).mean())
        pose_pred = {k: jnp.asarray(pred[k]) for k in
                     ("W", "nocs_per_point", "joint_axis_per_point",
                      "index_per_point")}
        out = jax.device_get(fit_frame_batch(
            pose_pred, jnp.asarray(batch["P"]), key, pose_cfg))
        for i, (sample, gtf) in enumerate(chunk):
            prefix = "nonlinear"
            fits.append({"R": out[f"{prefix}_R"][i], "s": out[f"{prefix}_s"][i],
                         "t": out[f"{prefix}_t"][i]})
            g = {"R": [], "s": [], "t": []}
            for j in range(K):
                s_, R_, t_ = tr.decompose_similarity(gtf.rt_nocs2cam[j])
                g["R"].append(R_)
                g["s"].append(s_)
                g["t"].append(t_)
            gts.append(g)
            nocs_pred_l.append(pred["nocs_per_point"][i])
            nocs_gt_l.append(sample["nocs_gt"])
            cls_l.append(sample["cls_gt"].astype(int))

    report = evaluate_fits(fits, gts, K, nocs_pred=nocs_pred_l,
                           nocs_gt=nocs_gt_l, cls_list=cls_l, miou_nres=30)
    print(f"seg accuracy: {np.mean(seg_acc):.4f}", flush=True)
    print(report.summary(), flush=True)
    os.makedirs(args.work, exist_ok=True)
    with open(os.path.join(args.work, "report.json"), "w") as f:
        json.dump({"per_part": report.per_part, "overall": report.overall,
                   "seg_acc": float(np.mean(seg_acc)),
                   "train_steps": step, "train_seconds": train_s}, f, indent=1)
    print("wrote", os.path.join(args.work, "report.json"))


if __name__ == "__main__":
    main()
