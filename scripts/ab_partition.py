"""A/B: legacy partition_by_class (stable argsort + full-width pos
gather) vs the composite-key sort + dynamic-slice rewrite, plus the full
pose fit before/after, all in ONE process (tunnel drift discipline).

The round-4 roofline session measured the pose stage's SETUP floor
(partition + part-buffer builds, before any RANSAC iterations) at
8.0 ms of the 14.3 ms total — this is the attack on its partition half.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def legacy_partition(cls, n_parts):
    import jax.numpy as jnp
    N = cls.shape[0]
    cls = jnp.clip(cls, 0, n_parts - 1)
    order_all = jnp.argsort(cls, stable=True).astype(jnp.int32)
    cnts = jnp.sum((cls[None, :] == jnp.arange(
        n_parts, dtype=cls.dtype)[:, None]).astype(jnp.int32), axis=1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)[:-1]])
    pos = jnp.minimum(starts[:, None]
                      + jnp.arange(N, dtype=jnp.int32)[None, :], N - 1)
    return order_all[pos], cnts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch,
                                                    partition_by_class)

    B, N, K = args.batch, args.points, 3
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.rand(B, N, K), jnp.float32)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    pred = {
        "W": W,
        "nocs_per_point": jnp.asarray(rng.rand(B, N, 3 * K), jnp.float32),
        "joint_axis_per_point": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "index_per_point": jnp.asarray(rng.rand(B, N, K), jnp.float32),
    }
    cfg = PoseFitConfig(n_parts=K, joint_types=("revolute", "revolute"),
                        ransac_chunk=None)
    key = jax.random.PRNGKey(1)

    # correctness first: new == legacy on the shared prefix, over ALL
    # batch elements and multiple caps (a vmap- or shape-dependent
    # divergence in the composite-key path must not pass; ADVICE r4)
    for cap in (1024, 257, N):
        for b in range(B):
            cls_b = jnp.argmax(W[b], -1)
            o_leg, c_leg = legacy_partition(cls_b, K)
            o_new, c_new = partition_by_class(cls_b, K, cap=cap)
            assert np.array_equal(np.asarray(c_leg), np.asarray(c_new))
            for j in range(K):
                n = min(cap, int(c_leg[j]))
                assert np.array_equal(np.asarray(o_leg)[j, :n],
                                      np.asarray(o_new)[j, :n]), (cap, b, j)
        # and through vmap itself (the production call shape)
        o_v, c_v = jax.vmap(lambda w: partition_by_class(
            jnp.argmax(w, -1), K, cap=cap))(W)
        o_l, c_l = jax.vmap(lambda w: legacy_partition(
            jnp.argmax(w, -1), K))(W)
        assert np.array_equal(np.asarray(c_v), np.asarray(c_l))
        cnt = np.asarray(c_l)
        for b in range(B):
            for j in range(K):
                n = min(cap, int(cnt[b, j]))
                assert np.array_equal(np.asarray(o_l)[b, j, :n],
                                      np.asarray(o_v)[b, j, :n]), (cap, b, j)
    print(f"parity: new partition == legacy on all valid prefixes "
          f"(all {B} frames, caps 257/1024/{N}, loop + vmap)")

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

    timed("partition LEGACY (argsort + pos gather)",
          lambda w: jax.vmap(
              lambda x: legacy_partition(jnp.argmax(x, -1), K))(w), W)
    timed("partition NEW full width",
          lambda w: jax.vmap(
              lambda x: partition_by_class(jnp.argmax(x, -1), K))(w), W)
    timed("partition NEW cap=1024",
          lambda w: jax.vmap(
              lambda x: partition_by_class(jnp.argmax(x, -1), K,
                                           cap=1024))(w), W)
    timed("pose fit FULL (production cfg)",
          lambda pp, p: fit_frame_batch(pp, p, key, cfg), pred, P)


if __name__ == "__main__":
    main()
