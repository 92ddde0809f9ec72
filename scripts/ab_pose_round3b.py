"""Round-3b pose ablation at the CURRENT bench defaults (512/128/10).

Attributes remaining pose-fit cost to rank the next levers:
- niter_part 512 -> 256 -> 128 (accuracy already flat to 128 in the
  noise sweep, scripts/ab_ransac_strength.py)
- the joint-axis masked_median votes (replaced by masked mean as an
  ablation probe -- NOT a candidate default, just cost attribution)
- lm_iters_refit 10 -> 6
All variants run 64-iter scan windows in one process.
"""
import argparse
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
        t0 = time.perf_counter()
        _ = float(window(*xs))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<44s} {dt*1e3:9.3f} ms/iter", flush=True)

    def cfg(**kw):
        base = dict(n_parts=K, joint_types=("revolute", "revolute"),
                    ransac_chunk=None)
        base.update(kw)
        return PoseFitConfig(**base)

    timed("full (current defaults 512/128/10)",
          lambda p, x: fit_frame_batch(p, x, key, cfg()), pred, P)
    timed("niter_part=256",
          lambda p, x: fit_frame_batch(p, x, key, cfg(niter_part=256)),
          pred, P)
    timed("niter_part=128",
          lambda p, x: fit_frame_batch(p, x, key, cfg(niter_part=128)),
          pred, P)
    timed("lm_iters_refit=6",
          lambda p, x: fit_frame_batch(p, x, key, cfg(lm_iters_refit=6)),
          pred, P)

    # median cost probe: swap masked_median for a masked mean
    real_median = pl.masked_median

    def masked_mean(x, mask):
        w = (mask > 0).astype(x.dtype)
        return jnp.sum(x * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)

    pl.masked_median = masked_mean
    try:
        timed("median -> mean (cost probe only)",
              lambda p, x: fit_frame_batch(p, x, key, cfg()), pred, P)
    finally:
        pl.masked_median = real_median

    timed("combined 256/128/6 + median probe off",
          lambda p, x: fit_frame_batch(p, x, key,
                                       cfg(niter_part=256, lm_iters_refit=6)),
          pred, P)


if __name__ == "__main__":
    main()
