"""Trained-model accuracy A/B for the packed butterfly ball query.

Loads an existing flagship checkpoint (scripts/train_synthetic_e2e.py
work dir) and evaluates the SAME held-out device-generated frames twice:
once with the exact butterfly kernel and once with `ball_query_packed=True`
(grouped coords quantized to 10-bit fixed point over the cloud bbox,
idx/cnt exact — ops/pallas/ball_query_butterfly.py).  Paired comparison:
identical params, identical frames, identical pose-fit RNG — any metric
delta is attributable to the quantization.

Usage (on the TPU):
  python scripts/ab_packed_eval.py --work /tmp/e2e_2048_24k --points 2048
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_eval(cfg, state_params_tree, args, joint_types):
    import jax

    from articulated_pose_tpu.data.device_synthetic import DeviceSynthetic
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.eval.pipeline import (evaluate_fits,
                                                    gt_joint_lines,
                                                    joint_errors,
                                                    pred_joint_lines)
    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch)
    from articulated_pose_tpu.train.state import make_eval_step

    K = cfg.n_max_parts
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=0)
    dg = DeviceSynthetic(gen, num_points=args.points, noise=args.noise)
    eval_step = make_eval_step(cfg)
    pose_cfg = PoseFitConfig(n_parts=K, niter_part=1024, niter_joint=128,
                             joint_types=joint_types, lm_iters_hypo=8,
                             lm_iters_refit=15, ransac_chunk=None)
    sample_batch = jax.jit(lambda k, n: dg.sample_batch(k, n),
                           static_argnums=1)
    fits, gts = [], []
    nocs_pred_l, nocs_gt_l, cls_l, seg_acc, joint_errs = [], [], [], [], []
    ek = jax.random.PRNGKey(9999)
    for lo in range(0, args.test_frames, args.batch):
        n = min(args.batch, args.test_frames - lo)
        ek, k1, k2 = jax.random.split(ek, 3)
        batch, gt = sample_batch(k1, n)
        pred, _ = eval_step(state_params_tree, batch)
        out = fit_frame_batch(
            {kk: pred[kk] for kk in ("W", "nocs_per_point",
                                     "joint_axis_per_point",
                                     "index_per_point")},
            batch["P"], k2, pose_cfg)
        batch, gt, pred, out = jax.device_get((batch, gt, pred, out))
        seg_acc.append((np.argmax(pred["W"], -1) ==
                        batch["cls_gt"].astype(int)).mean())
        for i in range(n):
            fits.append({"R": out["nonlinear_R"][i],
                         "s": out["nonlinear_s"][i],
                         "t": out["nonlinear_t"][i]})
            gts.append({"R": list(gt["R"][i]), "s": list(gt["s"][i]),
                        "t": list(gt["t"][i])})
            nocs_pred_l.append(pred["nocs_per_point"][i])
            nocs_gt_l.append(batch["nocs_gt"][i])
            cls_l.append(batch["cls_gt"][i].astype(int))
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
                           nocs_gt=nocs_gt_l, cls_list=cls_l, miou_nres=30)
    out = dict(report.overall)
    out["seg_acc"] = float(np.mean(seg_acc))
    if joint_errs:
        out["joint_axis_err_deg"] = float(
            np.mean([e["axis_err_deg"] for e in joint_errs]))
        out["joint_line_dist"] = float(
            np.mean([e["line_dist"] for e in joint_errs]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/e2e_2048_24k")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--parts", type=int, default=3)
    ap.add_argument("--joint-types", default=None)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--test-frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="trunk dtype for BOTH arms (bf16 = serving config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.train.state import create_train_state
    from articulated_pose_tpu.train.trainer import Checkpointer

    K = args.parts
    joint_types = (tuple(args.joint_types.split(","))
                   if args.joint_types else tuple(["revolute"] * (K - 1)))
    results = {}
    for name, packed in (("exact", False), ("packed", True)):
        cfg = NetworkConfig(n_max_parts=K, num_points=args.points,
                            batch_size=args.batch, val_interval=0,
                            snapshot_interval=0, compute_dtype=args.dtype,
                            ball_query_packed=packed)
        model = build_model(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, args.points, 3), np.float32))
        ck = Checkpointer(os.path.join(args.work, "model"))
        step = ck.latest_step()
        assert step is not None, f"no checkpoint under {args.work}"
        state = ck.restore(state)
        t0 = time.time()
        results[name] = run_eval(cfg, state, args, joint_types)
        print(f"[{name}] step={step} ({time.time() - t0:.0f}s): "
              f"{json.dumps({k: round(v, 4) for k, v in results[name].items()})}",
              flush=True)

    print("\npaired deltas (packed - exact):")
    for k in results["exact"]:
        d = results["packed"][k] - results["exact"][k]
        print(f"  {k}: {results['exact'][k]:.4f} -> "
              f"{results['packed'][k]:.4f}  ({d:+.4f})")


if __name__ == "__main__":
    main()
