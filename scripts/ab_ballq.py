"""A/B: butterfly fused ball-query+group vs plain kernel + flat-take gather.

Same-window scan-fused measurement (bench.py pattern) at the SA1/SA2
shapes, plus exact-parity assertions on the real TPU.
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu import ops
    from articulated_pose_tpu.ops.pallas import (query_ball_group_pallas,
                                                 query_ball_point_pallas)

    rng = np.random.RandomState(0)
    B = args.batch

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
        return dt

    for (N, M, S, r, tag) in [(2048, 512, 64, 0.2, "L1"),
                              (512, 128, 64, 0.4, "L2")]:
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])

        # parity on real hardware
        idx_ref, cnt_ref = ops.query_ball_point(r, S, xyz, q)
        grouped_ref = ops.group_point(xyz, idx_ref) - q[:, :, None, :]
        grouped, cnt, idx = query_ball_group_pallas(r, S, xyz, q,
                                                    emit_idx=True)
        print(f"{tag}: idx exact {np.array_equal(np.asarray(idx), np.asarray(idx_ref))}, "
              f"cnt exact {np.array_equal(np.asarray(cnt), np.asarray(cnt_ref))}, "
              f"grouped max|d| {float(jnp.max(jnp.abs(grouped - grouped_ref))):.2e}")

        def plain_path(x, qq):
            idx, _ = query_ball_point_pallas(r, S, x, qq)
            return ops.group_point(x, idx) - qq[:, :, None, :]

        timed(f"{tag} plain pallas bq + flat gather", plain_path, xyz, q)
        timed(f"{tag} butterfly fused (emit_idx=False)",
              lambda x, qq: query_ball_group_pallas(r, S, x, qq,
                                                    emit_idx=False)[:2],
              xyz, q)
        timed(f"{tag} butterfly fused (emit_idx=True)",
              lambda x, qq: query_ball_group_pallas(r, S, x, qq,
                                                    emit_idx=True),
              xyz, q)
        timed(f"{tag} bq only (plain pallas)",
              lambda x, qq: query_ball_point_pallas(r, S, x, qq), xyz, q)


if __name__ == "__main__":
    main()
