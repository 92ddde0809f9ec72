"""A/B: sequential per-joint RANSAC loop vs cfg.batch_joints=True
(vmapped same-type joint solves) at the flagship pose-fit shape.

Scan-fused windows with carry-perturbed inputs (bench.py pattern);
compare the two timings within ONE process — cross-window absolutes are
tunnel noise.  Run on the chip:

  python scripts/ab_batch_joints.py --batch 64 --iters 32
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--parts", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch)

    K = args.parts
    joint_types = tuple(["revolute"] * (K - 1))
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=0)
    rs = np.random.RandomState(0)
    frames = [gen.frame(rs, num_points=args.points)[0]
              for _ in range(args.batch)]
    P = jnp.asarray(np.stack([f["P"] for f in frames]), jnp.float32)
    W = jnp.asarray(np.stack([
        np.eye(K, dtype=np.float32)[f["cls_gt"].astype(int)]
        for f in frames]))
    nocs = jnp.asarray(np.stack([
        np.tile(f["nocs_gt"], (1, K)) for f in frames]), jnp.float32)
    axis = jnp.asarray(np.stack([f["orient_gt"] for f in frames]),
                       jnp.float32)
    index = jnp.asarray(np.stack([
        np.eye(K, dtype=np.float32)[f["joint_cls_gt"].astype(int) % K]
        for f in frames]))
    pred = {"W": W, "nocs_per_point": nocs,
            "joint_axis_per_point": axis, "index_per_point": index}

    import functools

    def timed(name, cfg):
        @functools.partial(jax.jit, static_argnums=())
        def window(pred, P, key):
            def body(carry, _):
                acc, key = carry
                key, kp, kf = jax.random.split(key, 3)
                Pi = P + 1e-30 * acc
                fits = fit_frame_batch(pred, Pi, kf, cfg)
                acc = acc + sum(jnp.sum(v.astype(jnp.float32))
                                for k, v in sorted(fits.items()))
                return (acc, key), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), jax.random.PRNGKey(0)),
                None, length=args.iters)
            return acc
        key = jax.random.PRNGKey(1)
        _ = float(window(pred, P, key))
        t0 = time.perf_counter()
        _ = float(window(pred, P, key))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<28s} {dt*1e3:9.3f} ms/iter "
              f"({args.batch/dt:8.0f} clouds/s)", flush=True)
        return dt

    base = dict(n_parts=K, niter_part=128, niter_joint=64,
                joint_types=joint_types, ransac_chunk=None)
    t_seq = timed("sequential joints", PoseFitConfig(**base))
    t_bat = timed("batch_joints=True", PoseFitConfig(**base,
                                                     batch_joints=True))
    print(f"speedup: {t_seq / t_bat:.3f}x")


if __name__ == "__main__":
    main()
