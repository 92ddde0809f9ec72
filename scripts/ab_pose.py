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
    cfg = PoseFitConfig(n_parts=K, niter_part=1024, niter_joint=128,
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

    timed("fit_frame_batch (full)",
          lambda p, x: fit_frame_batch(p, x, key, cfg), pred, P)

    # pieces at pipeline shapes
    W = pred["W"]
    timed("partition (butterfly)",
          lambda w: jax.vmap(lambda x: pl.partition_by_class(
              jnp.argmax(x, -1), K))(w), W)

    def partition_topk(cls, n_parts):
        Np = cls.shape[0]
        iota = jnp.arange(Np, dtype=jnp.int32)

        def one(j):
            member = cls == j
            keyo = jnp.where(member, -iota, -(Np + iota))
            order = -jax.lax.top_k(keyo, Np)[0]
            order = jnp.where(order >= Np, order - Np, order)
            return order, jnp.sum(member.astype(jnp.int32))

        return jax.vmap(one)(jnp.arange(n_parts))

    timed("partition (top_k, old)",
          lambda w: jax.vmap(lambda x: partition_topk(
              jnp.argmax(x, -1), K))(w), W)

    axis = pred["joint_axis_per_point"]
    mask = jnp.asarray(rng.rand(B, N) < 0.5, jnp.float32)
    timed("median (bisect)",
          lambda s, m: jax.vmap(pl.masked_median)(s, m), axis, mask)

    def median_sort(x, m):
        big = jnp.where(m[None, :] > 0, x.T, jnp.inf)
        v = jnp.sort(big, axis=-1)
        cnt = jnp.maximum(jnp.sum((m > 0).astype(jnp.int32)), 1)
        return (v[:, (cnt - 1) // 2] + v[:, cnt // 2]) / 2.0

    timed("median (sort, old)",
          lambda s, m: jax.vmap(median_sort)(s, m), axis, mask)

    from articulated_pose_tpu.pose import umeyama
    src = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    timed("pairwise_scale (stacked)",
          lambda s, t, m: jax.vmap(umeyama.pairwise_scale)(s, t, m),
          src, tgt, mask)

    def pairwise_seq(source, target, w):
        Np = source.shape[0]
        strides = [max(1, (k * Np) // 33) for k in range(1, 17)]
        num = jnp.zeros((), jnp.float32)
        den = jnp.zeros((), jnp.float32)
        for k in strides:
            ds = source - jnp.roll(source, k, axis=0)
            dt = target - jnp.roll(target, k, axis=0)
            a = jnp.sqrt(jnp.maximum(jnp.sum(ds * ds, -1), 0.0))
            b = jnp.sqrt(jnp.maximum(jnp.sum(dt * dt, -1), 0.0))
            ww = w * jnp.roll(w, k, axis=0)
            num = num + jnp.sum(ww * a * b)
            den = den + jnp.sum(ww * a * a)
        return num / (den + 1e-6)

    timed("pairwise_scale (seq, old)",
          lambda s, t, m: jax.vmap(pairwise_seq)(s, t, m), src, tgt, mask)


if __name__ == "__main__":
    main()
