"""Diagnostic: where does the butterfly kernel's time go?

Times the packed SA1 kernel with the routing loop truncated to k stages
(monkeypatched) for k in {0,3,6,9,11}: the slope gives ms/stage, the
k=0 intercept gives the prologue (distance matmul + rank matmuls +
pack) + extraction cost.  Results are WRONG numerically for k<11 —
timing only.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.ops.pallas import ball_query_butterfly as bb

    rng = np.random.RandomState(0)
    B, N, M, S, r = 64, 2048, 512, 64, 0.2
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    qi = rng.choice(N, size=(B, M))
    q = jnp.stack([xyz[b, qi[b]] for b in range(B)])

    orig_route = bb._butterfly_route

    def timed(name, fn, *xs, iters=64):
        @jax.jit
        def window(*xs):
            def body(acc, _):
                eps = 1e-30 * acc
                xs_i = [a + eps for a in xs]
                out = fn(*xs_i)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree.leaves(out)
                                 if l is not None), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), None,
                                  length=iters)
            return acc
        _ = float(window(*xs))
        t0 = time.perf_counter()
        _ = float(window(*xs))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<40s} {dt*1e3:9.3f} ms/iter", flush=True)
        return dt

    cases = [("stages 0..11", range(11), None),
             ("stages 0..6", range(6), None),
             ("stages 9,10 only", range(9, 11), None),
             ("stages 9,10 w/ sh=4,8", range(9, 11), {9: 2, 10: 3}),
             ("11 stages all sh=1024", range(11), {b: 10 for b in range(11)}),
             ("11 stages all sh=1", range(11), {b: 0 for b in range(11)})]
    for name, stages, remap in cases:
        def route_k(rem, planes, lane, interpret, _st=stages, _rm=remap):
            N_ = rem.shape[-1]
            for b in _st:
                sh = 1 << (b if _rm is None else _rm[b])
                srem = bb._roll_left(rem, sh, interpret)
                take = ((srem & sh) != 0) & (lane < N_ - sh)
                rem = jnp.where(take, srem - sh,
                                jnp.where((rem & sh) == 0, rem, bb._DEAD))
                planes = [jnp.where(take, bb._roll_left(v, sh, interpret), v)
                          for v in planes]
            return planes

        bb._butterfly_route = route_k
        # the kernel wrapper is itself @jax.jit'd: clear its trace cache
        # or every k after the first reuses the first trace
        bb.query_ball_group_pallas.clear_cache()
        try:
            timed(f"SA1 packed, {name}",
                  lambda x, qq: bb.query_ball_group_pallas(
                      r, S, x, qq, emit_idx=False, packed=True)[:2], xyz, q)
        finally:
            bb._butterfly_route = orig_route


if __name__ == "__main__":
    main()
