"""Forward/pose software-pipelining A/B (round 5, VERDICT r4 item 1).

docs/roofline_r4.md caps the serial pipeline at ~3.3-3.6k clouds/s by
ADDING the forward's HBM floor (8-10 ms / 64 clouds) to the pose
stage's VPU floor (~8 ms).  The two stages are independent per cloud
batch: pose(i) consumes forward(i)'s outputs but shares nothing with
forward(i+1).  Restructuring the scan body so pose(i-1) and forward(i)
sit in the SAME body with no data dependency gives XLA's latency-hiding
scheduler the freedom to overlap the VPU-bound pose work with the
forward's HBM DMA waits — if it takes it, the window cost approaches
max(floors) instead of sum(floors).

Arms (one process, same scan-window discipline as ab_pose_r4.py —
ratios only valid within one run):
  fwd-only        iters x forward
  pose-only       iters x pose fit on fixed tensors (carry-perturbed)
  serial          forward(i) -> pose(i) in one body (bench.py today)
  pipelined       forward(i) + pose(i-1) in one body, pred carried

  python scripts/ab_overlap.py [--iters 64] [--cheap-knobs]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--cheap-knobs", action="store_true",
                    help="pose knobs 64/64 refit3 score512 (the arms the "
                         "noise sweep measured flat) instead of production "
                         "128/64 refit6 score1024")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.models.ancsh import ANCSHModel
    from articulated_pose_tpu.models.pointnet2 import BackboneSpec
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

    B, N, K = args.batch, args.points, 3
    model = ANCSHModel(
        n_max_parts=K, mixed=True, pred_joint=True, dtype=jnp.bfloat16,
        backbone_spec=BackboneSpec(fps_impl="pallas", ball_query_impl="pallas",
                                   ball_query_packed=True,
                                   three_nn_impl="pallas"))
    rng = jax.random.PRNGKey(0)
    P = jnp.asarray(np.random.RandomState(0).rand(B, N, 3), jnp.float32)
    variables = model.init(rng, P)

    knobs = (dict(niter_part=64, lm_iters_refit=3, ransac_score_points=512)
             if args.cheap_knobs else
             dict(niter_part=128, lm_iters_refit=6, ransac_score_points=1024))
    pose_cfg = PoseFitConfig(n_parts=K, niter_joint=64,
                             joint_types=("revolute", "revolute"),
                             ransac_chunk=None, **knobs)
    POSE_KEYS = ("W", "nocs_per_point", "joint_axis_per_point",
                 "index_per_point")

    def forward(variables, Pi):
        pred = model.apply(variables, Pi, train=False)
        return {k: pred[k] for k in POSE_KEYS}

    def pose(pp, Pi, kf):
        fits = fit_frame_batch(pp, Pi, kf, pose_cfg)
        return (fits["baseline_R"], fits["nonlinear_R"])

    def tsum(tree):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(tree) if l is not None)

    def run(name, window, *xs):
        _ = float(window(*xs))                     # compile + warm
        t0 = time.perf_counter()
        _ = float(window(*xs))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<28s} {dt*1e3:9.3f} ms/iter "
              f"({B/dt:8.0f} clouds/s)", flush=True)
        return dt

    key = jax.random.PRNGKey(1)

    # ---- fwd-only --------------------------------------------------------
    @jax.jit
    def w_fwd(variables, P, key):
        def body(carry, _):
            acc, key = carry
            key, kp = jax.random.split(key)
            Pi = P + 0.01 * jax.random.normal(kp, P.shape, P.dtype)
            acc = acc + tsum(forward(variables, Pi))
            return (acc, key), None
        (acc, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), key),
                                   None, length=args.iters)
        return acc

    # ---- pose-only (fixed random pred, carry-perturbed vs CSE) -----------
    rs = np.random.RandomState(1)
    pred0 = {"W": jnp.asarray(rs.rand(B, N, K), jnp.float32),
             "nocs_per_point": jnp.asarray(rs.rand(B, N, 3 * K), jnp.float32),
             "joint_axis_per_point": jnp.asarray(rs.rand(B, N, 3), jnp.float32),
             "index_per_point": jnp.asarray(rs.rand(B, N, K), jnp.float32)}

    @jax.jit
    def w_pose(pred0, P, key):
        def body(carry, _):
            acc, key = carry
            key, kf = jax.random.split(key)
            eps = 1e-30 * acc
            pp = jax.tree.map(lambda a: a + eps, pred0)
            acc = acc + tsum(pose(pp, P + eps, kf))
            return (acc, key), None
        (acc, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), key),
                                   None, length=args.iters)
        return acc

    # ---- serial (bench.py body today) -------------------------------------
    @jax.jit
    def w_serial(variables, P, key):
        def body(carry, _):
            acc, key = carry
            key, kp, kf = jax.random.split(key, 3)
            Pi = P + 0.01 * jax.random.normal(kp, P.shape, P.dtype)
            acc = acc + tsum(pose(forward(variables, Pi), Pi, kf))
            return (acc, key), None
        (acc, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), key),
                                   None, length=args.iters)
        return acc

    # ---- pipelined: forward(i) || pose(i-1) --------------------------------
    # prologue forward feeds the first body; epilogue pose drains the last
    # carried pred.  Total work = iters forwards + iters poses, same as
    # serial; only the dependency structure changes.
    @jax.jit
    def w_pipe(variables, P, key):
        key, kp0 = jax.random.split(key)
        P0 = P + 0.01 * jax.random.normal(kp0, P.shape, P.dtype)
        pred0 = forward(variables, P0)

        def body(carry, _):
            acc, key, prev_pred, prev_P = carry
            key, kp, kf = jax.random.split(key, 3)
            Pi = P + 0.01 * jax.random.normal(kp, P.shape, P.dtype)
            pred = forward(variables, Pi)          # no dep on prev_*
            acc = acc + tsum(pose(prev_pred, prev_P, kf))
            return (acc, key, pred, Pi), None
        (acc, key, lp, lP), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), key, pred0, P0), None,
            length=args.iters - 1)
        key, kf = jax.random.split(key)
        return acc + tsum(pose(lp, lP, kf))

    t_f = run("fwd-only", w_fwd, variables, P, key)
    t_p = run("pose-only", w_pose, pred0, P, key)
    t_s = run("serial (fwd->pose)", w_serial, variables, P, key)
    t_o = run("pipelined (fwd || pose-1)", w_pipe, variables, P, key)

    print(f"\nsum(floors) fwd+pose     {1e3*(t_f+t_p):9.3f} ms/iter")
    print(f"max(floors)              {1e3*max(t_f, t_p):9.3f} ms/iter")
    print(f"serial vs sum            {t_s/(t_f+t_p):9.3f}x")
    print(f"pipelined vs serial      {t_s/t_o:9.3f}x speedup "
          f"({100*(1 - t_o/t_s):.1f}% saved)")
    ideal = max(t_f, t_p)
    frac = (t_f + t_p - t_o) / max(t_f + t_p - ideal, 1e-9)
    print(f"overlap achieved         {frac:9.3f} of ideal")


if __name__ == "__main__":
    main()
