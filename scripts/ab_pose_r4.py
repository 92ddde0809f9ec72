"""Production-config pose-fit ablation (round 4).

docs/perf_round3.md's ablation table ran at niter_part=1024 /
niter_joint=128 / refit 15; production ships 128/64/6 (config.py), where
the measured sub-stages (partition 0.64 + part RANSAC 0.99 + joint hypo
1.07 + refit 1.5 + pairwise 0.55 + median 0.59 ~ 5.3 ms) leave roughly
half the 10.7-14 ms pose fit unattributed.  This ablates fit_frame_batch
AT the production knobs, one knob per arm, all in one process window
(same discipline as ab_pose_ablate.py: 64-iter scan, carry-perturbed
inputs so XLA can't hoist).
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

    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch)

    B, N, K = args.batch, args.points, 3
    rng = np.random.RandomState(0)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    pred = {
        "W": jnp.asarray(rng.rand(B, N, K), jnp.float32),
        "nocs_per_point": jnp.asarray(rng.rand(B, N, 3 * K), jnp.float32),
        "joint_axis_per_point": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "index_per_point": jnp.asarray(rng.rand(B, N, K), jnp.float32),
    }
    pred_nojoint = {k: v for k, v in pred.items()
                    if k in ("W", "nocs_per_point")}
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
        print(f"{name:<48s} {dt*1e3:9.3f} ms/iter", flush=True)

    def cfg(**kw):
        # config.py production defaults for the flagship category
        base = dict(n_parts=K, niter_part=128, niter_joint=64,
                    joint_types=("revolute", "revolute"),
                    lm_iters_hypo=10, lm_iters_refit=6,
                    ransac_chunk=None, part_points=1024,
                    ransac_score_points=1024, lm_refit_points=512)
        base.update(kw)
        return PoseFitConfig(**base)

    arms = [
        ("full (production 128/64/6)", cfg(), pred),
        ("no joint stage", cfg(), pred_nojoint),
        ("niter_part=1", cfg(niter_part=1), pred),
        ("niter_joint=1", cfg(niter_joint=1), pred),
        ("lm_iters_refit=1", cfg(lm_iters_refit=1), pred),
        ("lm_refit_points=128", cfg(lm_refit_points=128), pred),
        ("part_points=512", cfg(part_points=512,
                                ransac_score_points=512), pred),
        ("score_points=256", cfg(ransac_score_points=256), pred),
        ("no joints + niter_part=1 (setup floor)",
         cfg(niter_part=1), pred_nojoint),
        # the knob set the noise sweep calls accuracy-flat (pending the
        # trained-checkpoint A/B): paired pose-stage gain, same window
        ("CHEAP 64/64 refit3 score512",
         cfg(niter_part=64, lm_iters_refit=3,
             ransac_score_points=512), pred),
    ]
    for name, c, p in arms:
        timed(name, lambda pp, xx, c=c: fit_frame_batch(pp, xx, key, c),
              p, P)


if __name__ == "__main__":
    main()
