"""A/B: part-buffer builds for the pose stage (VERDICT r4 item 2b).

The round-4 roofline names the residual pose-SETUP cost: "buffer builds
are elementwise gathers of 2x(K*cap) rows" on a chip whose effective
gather rate probed at 0.6 GB/s (docs/roofline_r4.md).  Three arms, one
process (tunnel drift discipline):

  gather  — incumbent (pose/pipeline.py fit_frame): partition_by_class
            then two row gathers (take_along_axis on the (K,N,3) nocs
            planes + P[orders]).
  combo   — ONE row gather of the concatenated (N, 3+3K) payload; same
            rows, half the gather ops, 2x the bytes per row.
  sort    — no gathers at all: the composite-key sort carries the
            payload columns as lax.sort value operands, then each part's
            buffer is a contiguous dynamic slice at its class start —
            the same contiguous-copy trick that won 6.3x on the
            partition itself (docs/perf_round4.md).

Parity: every arm must produce identical masked (src, tgt, mask, cnts)
on ALL batch elements and multiple caps (ADVICE r4: batch-0-only parity
can hide vmap-specific divergence).
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
    ap.add_argument("--parts", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from articulated_pose_tpu.pose.pipeline import (PoseFitConfig,
                                                    fit_frame_batch,
                                                    partition_by_class)

    B, N, K = args.batch, args.points, args.parts
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.rand(B, N, K), jnp.float32)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    nocs = jnp.asarray(rng.rand(B, N, 3 * K), jnp.float32)

    def build_gather(P1, nocs1, cls, cap):
        orders_c, cnts = partition_by_class(cls, K, cap=cap)
        iota_c = jnp.arange(cap)
        mask = (iota_c[None, :] < cnts[:, None]).astype(P1.dtype)
        nocs_parts = jnp.transpose(nocs1.reshape(N, K, 3), (1, 0, 2))
        src = jnp.take_along_axis(nocs_parts, orders_c[:, :, None], axis=1)
        src = src * mask[:, :, None]
        tgt = P1[orders_c] * mask[:, :, None]
        return src, tgt, mask, cnts

    def build_combo(P1, nocs1, cls, cap):
        orders_c, cnts = partition_by_class(cls, K, cap=cap)
        iota_c = jnp.arange(cap)
        mask = (iota_c[None, :] < cnts[:, None]).astype(P1.dtype)
        X = jnp.concatenate([P1, nocs1], axis=1)          # (N, 3+3K)
        rows = X[orders_c]                                # (K, cap, 3+3K)
        tgt = rows[..., :3] * mask[:, :, None]
        src = jnp.stack([rows[j, :, 3 + 3 * j:6 + 3 * j] for j in range(K)])
        src = src * mask[:, :, None]
        return src, tgt, mask, cnts

    def build_sort(P1, nocs1, cls, cap):
        cls = jnp.clip(cls, 0, K - 1)
        shift = max(1, (N - 1).bit_length())
        iota = jnp.arange(N, dtype=jnp.int32)
        ckey = (cls.astype(jnp.int32) << shift) | iota
        cols = [P1[:, c] for c in range(3)]
        cols += [nocs1[:, 3 * j + c] for j in range(K) for c in range(3)]
        sorted_ = lax.sort([ckey] + cols, num_keys=1)
        cnts = jnp.sum((cls[None, :] == jnp.arange(
            K, dtype=cls.dtype)[:, None]).astype(jnp.int32), axis=1)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)[:-1]])
        zpad = jnp.zeros((cap,), P1.dtype)
        padded = [jnp.concatenate([c, zpad]) for c in sorted_[1:]]
        iota_c = jnp.arange(cap)
        mask = (iota_c[None, :] < cnts[:, None]).astype(P1.dtype)

        def rows(colset, j):
            return jnp.stack([lax.dynamic_slice(padded[i], (starts[j],),
                                                (cap,)) for i in colset],
                             axis=1)
        tgt = jnp.stack([rows(range(0, 3), j) for j in range(K)])
        src = jnp.stack([rows(range(3 + 3 * j, 6 + 3 * j), j)
                         for j in range(K)])
        return (src * mask[:, :, None], tgt * mask[:, :, None], mask, cnts)

    builds = {"gather": build_gather, "combo": build_combo,
              "sort": build_sort}

    # ---- parity: all arms equal on ALL batch elements, two caps -------
    for cap in (1024, N):
        ref = jax.vmap(lambda p, n, w: build_gather(
            p, n, jnp.argmax(w, -1), cap))(P, nocs, W)
        for name in ("combo", "sort"):
            got = jax.vmap(lambda p, n, w: builds[name](
                p, n, jnp.argmax(w, -1), cap))(P, nocs, W)
            for a, b, what in zip(ref, got, ("src", "tgt", "mask", "cnts")):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{name} cap={cap} {what}")
    print(f"parity: combo & sort == gather on all {B} batch elements, "
          f"caps (1024, {N})")

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

    cap = 1024
    for name, fn in builds.items():
        timed(f"build {name} (B={B}, N={N}, K={K}, cap={cap})",
              lambda p, n, w, fn=fn: jax.vmap(
                  lambda p1, n1, w1: fn(p1, n1, jnp.argmax(w1, -1), cap))(
                  p, n, w), P, nocs, W)

    # full pose fit with the incumbent vs the sort build (config knob)
    pred = {
        "W": W, "nocs_per_point": nocs,
        "joint_axis_per_point": jnp.asarray(rng.rand(B, N, 3), jnp.float32),
        "index_per_point": jnp.asarray(rng.rand(B, N, K), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    for method in ("gather", "sort"):
        cfg = PoseFitConfig(n_parts=K,
                            joint_types=("revolute",) * (K - 1),
                            ransac_chunk=None, buffer_build=method)
        timed(f"pose fit FULL ({method} build)",
              lambda pp, p, cfg=cfg: fit_frame_batch(pp, p, key, cfg),
              pred, P)


if __name__ == "__main__":
    main()
