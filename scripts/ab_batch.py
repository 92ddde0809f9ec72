"""Paired batch-size sweep: forward+pose windows for several B in ONE
process (cross-window chip drift otherwise swamps the comparison)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--batches", default="64,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.models.ancsh import ANCSHModel
    from articulated_pose_tpu.models.pointnet2 import BackboneSpec
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

    N, K = 2048, 3
    model = ANCSHModel(
        n_max_parts=K, mixed=True, pred_joint=True, dtype=jnp.bfloat16,
        backbone_spec=BackboneSpec(fps_impl="pallas",
                                   ball_query_impl="pallas",
                                   three_nn_impl="pallas"))
    pose_cfg = PoseFitConfig(n_parts=K, joint_types=("revolute", "revolute"),
                             ransac_chunk=None)

    def run(B):
        P = jnp.asarray(np.random.RandomState(0).rand(B, N, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), P)

        @jax.jit
        def window(variables, P, key):
            def body(carry, _):
                acc, key = carry
                key, kp, kf = jax.random.split(key, 3)
                Pi = P + 0.01 * jax.random.normal(kp, P.shape, P.dtype)
                pred = model.apply(variables, Pi, train=False)
                pose_pred = {k: pred[k] for k in
                             ("W", "nocs_per_point", "joint_axis_per_point",
                              "index_per_point")}
                fits = fit_frame_batch(pose_pred, Pi, kf, pose_cfg)
                acc = acc + sum(jnp.sum(l.astype(jnp.float32))
                                for l in (fits["baseline_R"],
                                          fits["nonlinear_R"]))
                return (acc, key), None
            (acc, _), _ = jax.lax.scan(body, (jnp.zeros(()), key), None,
                                       length=args.iters)
            return acc

        key = jax.random.PRNGKey(1)
        _ = float(window(variables, P, key))
        for run_i in (1, 2):
            t0 = time.perf_counter()
            _ = float(window(variables, P, jax.random.PRNGKey(run_i + 1)))
            dt = time.perf_counter() - t0
            print(f"B={B:<4d} run{run_i}: {B * args.iters / dt:8.1f} clouds/s"
                  f"  ({dt / args.iters * 1e3:6.2f} ms/iter)", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        run(b)


if __name__ == "__main__":
    main()
