"""A/B harness for pose-fit internals: times fit_frame_batch plus toggled
variants twice each in one process (tunnel noise shows as run1/run2 drift)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.pose import pipeline as pl
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

    B, N, K = args.batch, args.points, 3
    rng = np.random.RandomState(0)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    pred = {
        "W": jnp.asarray(rng.rand(B, N, K), jnp.float32),
        "nocs_per_point": jnp.asarray(rng.rand(B, N, 3 * K), jnp.float32),
        "joint_axis_per_point": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "index_per_point": jnp.asarray(rng.rand(B, N, K), jnp.float32),
    }
    cfg = PoseFitConfig(n_parts=K, niter_part=512, niter_joint=128,
                        joint_types=("revolute", "revolute"),
                        lm_iters_hypo=8, lm_iters_refit=15,
                        ransac_chunk=None, lm_refit_points=512)
    key = jax.random.PRNGKey(0)

    def timed(name, fn, *xs):
        @jax.jit
        def window(*xs):
            def body(acc, _):
                eps = 1e-30 * acc
                xs_i = jax.tree.map(
                    lambda a: a + eps.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, xs)
                out = fn(*xs_i)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree.leaves(out)
                                 if l is not None), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), None,
                                  length=args.iters)
            return acc
        _ = float(window(*xs))
        for run in (1, 2):
            t0 = time.perf_counter()
            _ = float(window(*xs))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:<36s} run{run} {dt*1e3:9.3f} ms/iter", flush=True)

    # measurement-floor control: a single fused op at batch scale
    timed("floor control (P + 1.0 sum)",
          lambda x: jnp.sum(x + 1.0), P)

    timed("fit_frame_batch (full)",
          lambda p, x: fit_frame_batch(p, x, key, cfg), pred, P)


if __name__ == "__main__":
    main()
