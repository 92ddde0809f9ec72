"""Byte/FLOP accounting for the roofline close-out (docs/roofline_r4.md).

Lowers the bench pipeline's stages at the production shape and prints
XLA's own cost analysis (flops, bytes accessed) per stage, plus the
derived time floors against measured chip limits
(scripts/probe_chip_limits.py).

Runs on CPU by default — the analysis reads the optimized HLO, not an
execution — so it never needs the chip:

  JAX_PLATFORMS=cpu python scripts/roofline_accounting.py
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cost_of(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return {"gflops": c.get("flops", 0.0) / 1e9,
            "mbytes": c.get("bytes accessed", 0.0) / 1e6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.models.ancsh import ANCSHModel
    from articulated_pose_tpu.models.pointnet2 import BackboneSpec
    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch)
    from articulated_pose_tpu import ops

    B, N, K = args.batch, args.points, 3
    rng = np.random.RandomState(0)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    # XLA tiers so the analysis covers the whole program (the Pallas
    # kernels are opaque custom-calls to the analyzer; their measured
    # per-stage costs come from scripts/profile_stages.py instead)
    model = ANCSHModel(
        n_max_parts=K, mixed=True, pred_joint=True, dtype=jnp.bfloat16,
        backbone_spec=BackboneSpec(fps_impl="xla", ball_query_impl="xla",
                                   three_nn_impl="xla"))
    variables = model.init(jax.random.PRNGKey(1), P)

    out = {}
    out["forward (XLA tiers)"] = cost_of(
        lambda v, x: model.apply(v, x, train=False), variables, P)

    pred = {
        "W": jnp.asarray(rng.rand(B, N, K), jnp.float32),
        "nocs_per_point": jnp.asarray(rng.rand(B, N, 3 * K), jnp.float32),
        "joint_axis_per_point": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "index_per_point": jnp.asarray(rng.rand(B, N, K), jnp.float32),
    }
    cfg = PoseFitConfig(n_parts=K, niter_part=128, niter_joint=64,
                        joint_types=("revolute", "revolute"),
                        ransac_chunk=None)
    out["pose fit (production cfg)"] = cost_of(
        lambda p, x: fit_frame_batch(p, x, key, cfg), pred, P)

    # stage-level (XLA formulations; same shapes the model runs)
    q = P[:, :512]
    out["fps 2048->512"] = cost_of(
        lambda x: ops.farthest_point_sample(512, x), P)
    out["ball query SA1 (xla rank-select)"] = cost_of(
        lambda x, qq: ops.query_ball_point(0.2, 64, x, qq), P, q)
    out["three_nn FP1"] = cost_of(
        lambda x, qq: ops.three_nn(x, qq), P, q)

    for k, v in out.items():
        print(f"{k:<38s} {v['gflops']:10.2f} GF {v['mbytes']:10.1f} MB")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
