"""Diagnose the trained-checkpoint A/B failure: restore the e2e sweep
checkpoint exactly like ab_pose_knobs_trained.py does, run eval_step on
one device-generated batch, and print segmentation accuracy + prediction
stats.  If seg acc is ~random (1/K) the restore/eval path is broken; if
it matches the sweep's ~0.96 the bug is in the A/B's pose/eval side.

  python scripts/diag_restore_eval.py --work /tmp/e2e_sweep_eyeglasses \
      --category eyeglasses --seed 1
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--category", default="eyeglasses")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--noise", type=float, default=0.005)
    args = ap.parse_args()

    import jax

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.device_synthetic import DeviceSynthetic
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.registry import get_category
    from articulated_pose_tpu.train.state import (create_train_state,
                                                  make_eval_step)
    from articulated_pose_tpu.train.trainer import Checkpointer

    spec = get_category(args.category)
    K = spec.n_parts
    cfg = NetworkConfig(n_max_parts=K, num_points=args.points,
                        batch_size=args.batch, val_interval=0,
                        snapshot_interval=0)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               np.zeros((1, args.points, 3), np.float32))
    p0 = jax.tree.leaves(state.params)[0]
    print("init params[0] mean/std:", float(np.mean(np.asarray(p0))),
          float(np.std(np.asarray(p0))), flush=True)
    bs0 = {k: float(np.mean(np.asarray(v)))
           for k, v in zip(["bs0"], jax.tree.leaves(state.batch_stats)[:1])}
    print("init batch_stats[0] mean:", bs0, flush=True)

    ck = Checkpointer(os.path.join(args.work, "model"))
    state = ck.restore(state)
    print(f"restored step {int(state.step)}", flush=True)
    p1 = jax.tree.leaves(state.params)[0]
    print("restored params[0] mean/std:", float(np.mean(np.asarray(p1))),
          float(np.std(np.asarray(p1))), flush=True)
    b1 = jax.tree.leaves(state.batch_stats)[0]
    print("restored batch_stats[0] mean/std:",
          float(np.mean(np.asarray(b1))), float(np.std(np.asarray(b1))),
          flush=True)

    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=tuple(spec.joint_types),
                               seed=args.seed)
    dg = DeviceSynthetic(gen, num_points=args.points, noise=args.noise)
    eval_step = make_eval_step(cfg)
    ek = jax.random.PRNGKey(9999)
    ek, k1, _ = jax.random.split(ek, 3)
    batch, gt = jax.jit(lambda k: dg.sample_batch(k, args.batch))(k1)
    pred, _ = eval_step(state, batch)
    W = np.asarray(pred["W"])
    cls_gt = np.asarray(batch["cls_gt"]).astype(int)
    seg = (np.argmax(W, -1) == cls_gt).mean()
    print(f"seg acc: {seg:.4f}  (random = {1.0 / K:.3f})", flush=True)
    print("W row mean per class:", np.round(W.mean(axis=(0, 1)), 4),
          flush=True)
    print("pred class histogram:",
          np.bincount(np.argmax(W, -1).ravel(), minlength=K), flush=True)
    nocs = np.asarray(pred["nocs_per_point"])
    print("nocs pred mean/std:", float(nocs.mean()), float(nocs.std()),
          flush=True)

    # (b) bypass the restored running averages: train=True computes BN
    # stats from the batch itself (dropout noise aside).  If seg acc
    # recovers, the corruption is in batch_stats, not params.
    from articulated_pose_tpu.train.state import _forward_loss
    _, (_, _, pred_t) = _forward_loss(
        state.params, state.batch_stats, state.apply_fn, batch, cfg,
        train=True, rng=jax.random.PRNGKey(3), step=state.step)
    seg_t = (np.argmax(np.asarray(pred_t["W"]), -1) == cls_gt).mean()
    print(f"seg acc train-mode BN: {seg_t:.4f}", flush=True)

    # (a) raw restore (no template): does the checkpoint's own tree
    # match what the template restore produced leaf-by-leaf?
    import orbax.checkpoint as ocp
    mgr = ocp.CheckpointManager(os.path.abspath(
        os.path.join(args.work, "model")))
    raw = mgr.restore(mgr.latest_step())
    tpl = {"params": state.params, "batch_stats": state.batch_stats}
    for part in ("params", "batch_stats"):
        a = jax.tree.leaves(raw[part])
        b = jax.tree.leaves(tpl[part])
        same = len(a) == len(b) and all(
            np.asarray(x).shape == np.asarray(y).shape
            and np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(a, b))
        print(f"raw-vs-template {part}: leaves {len(a)} vs {len(b)}, "
              f"equal={same}", flush=True)


if __name__ == "__main__":
    main()
