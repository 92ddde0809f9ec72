"""A/B harness for butterfly ball-query kernel changes.

Times the fused butterfly kernel (exact and packed planes) at the SA1
and SA2 shapes in scan-fused 64-iter windows (bench.py pattern), with
exact-parity assertions against the XLA oracle on whatever backend is
live.  Run before/after kernel edits; compare ratios within one
process, not absolutes across windows (tunnel drift).
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
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu import ops
    from articulated_pose_tpu.ops.pallas import query_ball_group_pallas

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
        print(f"{name:<40s} {dt*1e3:9.3f} ms/iter", flush=True)
        return dt

    for (N, M, S, r, tag) in [(2048, 512, 64, 0.2, "SA1"),
                              (512, 128, 64, 0.4, "SA2")]:
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])

        if not args.skip_parity:
            idx_ref, cnt_ref = ops.query_ball_point(r, S, xyz, q)
            grouped_ref = ops.group_point(xyz, idx_ref) - q[:, :, None, :]
            for packed in (False, True):
                for transposed in (False, True):
                    grouped, cnt, idx = query_ball_group_pallas(
                        r, S, xyz, q, emit_idx=True, packed=packed,
                        transposed=transposed)
                    ok_i = np.array_equal(np.asarray(idx),
                                          np.asarray(idx_ref))
                    ok_c = np.array_equal(np.asarray(cnt),
                                          np.asarray(cnt_ref))
                    dmax = float(jnp.max(jnp.abs(grouped - grouped_ref)))
                    print(f"{tag} packed={packed} transposed={transposed}: "
                          f"idx exact {ok_i}, cnt exact {ok_c}, "
                          f"grouped max|d| {dmax:.2e}")
                    assert ok_i and ok_c
                    assert dmax < (1e-6 if not packed else 1.2e-3)

        # SA1 runs emit_idx=False in the model; SA2 runs emit_idx=True
        emit = tag == "SA2"
        timed(f"{tag} butterfly exact (emit_idx={emit})",
              lambda x, qq, e=emit: query_ball_group_pallas(
                  r, S, x, qq, emit_idx=e)[:2], xyz, q)
        timed(f"{tag} butterfly packed (emit_idx={emit})",
              lambda x, qq, e=emit: query_ball_group_pallas(
                  r, S, x, qq, emit_idx=e, packed=True)[:2], xyz, q)
        timed(f"{tag} butterfly exact TRANSPOSED (emit_idx={emit})",
              lambda x, qq, e=emit: query_ball_group_pallas(
                  r, S, x, qq, emit_idx=e, transposed=True)[:2], xyz, q)
        timed(f"{tag} butterfly packed TRANSPOSED (emit_idx={emit})",
              lambda x, qq, e=emit: query_ball_group_pallas(
                  r, S, x, qq, emit_idx=e, packed=True,
                  transposed=True)[:2], xyz, q)
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        timed(f"{tag} bucket segment-sum (emit_idx={emit})",
              lambda x, qq, e=emit: query_ball_group_bucket(
                  r, S, x, qq, emit_idx=e)[:2], xyz, q)

        def bucket_xla(x, qq):
            # comparable work to the fused kernels: query + grouped,
            # centered coords
            idx, cnt = ops.query_ball_point_bucket(r, S, x, qq)
            g = ops.group_point(x, idx) - qq[:, :, None, :]
            return g, cnt
        timed(f"{tag} bucket XLA (query+group)", bucket_xla, xyz, q)


if __name__ == "__main__":
    main()
