"""Stage-level throughput profile of the flagship forward + pose fit.

Times each pipeline stage in its own scan-fused single-dispatch window
(the bench.py measurement pattern) so tunnel latency amortizes, and
prints a per-stage ms/iter table.  Use to find where cloud-time goes
before optimizing (VERDICT round-1 item 2).

Usage: python scripts/profile_stages.py [--batch 64] [--points 2048]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=64,
                    help="64 amortizes the ~30ms window-fetch floor "
                         "(docs/perf_round3.md)")
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--stages", default=None,
                    help="comma list to restrict (names from the table)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu import ops
    from articulated_pose_tpu.models.ancsh import ANCSHModel
    from articulated_pose_tpu.models.pointnet2 import BackboneSpec, resolve_impl
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

    B, N, K = args.batch, args.points, 3
    rng = np.random.RandomState(0)
    P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)

    want_early = set(args.stages.split(",")) if args.stages else None
    need_model = want_early is None or want_early & {"forward", "pose"}
    if need_model:
        model = ANCSHModel(n_max_parts=K, mixed=True, pred_joint=True,
                           dtype=jnp.bfloat16,
                           backbone_spec=BackboneSpec(
                               fps_impl=args.impl,
                               ball_query_impl=args.impl))
        variables = model.init(jax.random.PRNGKey(0), P)
        pred = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, P)
        pose_pred = {k: pred[k] for k in ("W", "nocs_per_point",
                                          "joint_axis_per_point",
                                          "index_per_point")}
    # library defaults = bench.py's production settings (niter 128/64,
    # refit 6, part_points cap, scoring prefix)
    pose_cfg = PoseFitConfig(
        n_parts=K, joint_types=("revolute", "revolute"), ransac_chunk=None)

    def timed(name, fn, *xs):
        """One-dispatch scan window over iters; returns ms/iter.

        Every float input is perturbed by a carry-dependent epsilon so
        XLA cannot hoist the loop body out of the scan (loop-invariant
        code motion would otherwise measure ONE evaluation as `iters`).
        """
        @functools.partial(jax.jit, static_argnums=())
        def window(*xs):
            def body(acc, _):
                eps = 1e-30 * acc
                xs_i = jax.tree.map(
                    lambda a: a + eps.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, xs)
                out = fn(*xs_i)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree.leaves(out)), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32), None,
                                  length=args.iters)
            return acc
        _ = float(window(*xs))  # compile+warm
        t0 = time.perf_counter()
        _ = float(window(*xs))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<28s} {dt*1e3:9.3f} ms/iter "
              f"{B/dt:10.0f} clouds/s", flush=True)
        return dt

    impl = resolve_impl(args.impl)
    if impl == "pallas":
        from articulated_pose_tpu.ops.pallas import (
            farthest_point_sample_pallas, query_ball_point_pallas)
        fps512 = lambda x: farthest_point_sample_pallas(512, x)
        fps128 = lambda m: lambda x: farthest_point_sample_pallas(128, x)
        bq = lambda r, s: lambda x, q: query_ball_point_pallas(r, s, x, q)[0]
    else:
        fps512 = lambda x: ops.farthest_point_sample(512, x)
        bq = lambda r, s: lambda x, q: ops.query_ball_point(r, s, x, q)[0]

    want = set(args.stages.split(",")) if args.stages else None

    def on(name):
        return want is None or name in want

    Q1 = jnp.asarray(rng.rand(B, 512, 3), jnp.float32)
    Q2 = jnp.asarray(rng.rand(B, 128, 3), jnp.float32)
    feats = jnp.asarray(rng.rand(B, N, 128), jnp.bfloat16)

    if on("forward"):
        timed("forward (full model)",
              lambda v, p: model.apply(v, p, train=False), variables, P)
    if on("fps1"):
        timed("fps 2048->512", fps512, P)
    if on("fps2"):
        if impl == "pallas":
            timed("fps 512->128",
                  lambda x: farthest_point_sample_pallas(128, x), Q1)
        else:
            timed("fps 512->128",
                  lambda x: ops.farthest_point_sample(128, x), Q1)
    if on("bq1"):
        timed("ball query L1 (512q, 2048)", bq(0.2, 64), P, Q1)
    if on("bq2"):
        timed("ball query L2 (128q, 512)", bq(0.4, 64), Q1, Q2)
    if on("group"):
        idx = bq(0.2, 64)(P, Q1)
        timed("group 128ch feats", lambda f, i: ops.group_point(f, i),
              feats, idx)
    if on("threenn"):
        timed("three_nn 2048<-512",
              lambda x, q: ops.three_nn(x, q)[0], P, Q1)
    if on("pose"):
        key = jax.random.PRNGKey(1)
        timed("pose fit (full)",
              lambda pp, p: fit_frame_batch(pp, p, key, pose_cfg),
              pose_pred, P)

    # ---- pose sub-stages (shapes as inside fit_frame at B=batch) -------
    if want is None or want & {"partition", "ransac1", "jhypo", "jrefit",
                               "pscale", "median"}:
        from articulated_pose_tpu.pose import umeyama
        from articulated_pose_tpu.pose.lm import (
            joint_transformation_estimate, joint_transformation_estimate_alt)
        from articulated_pose_tpu.pose.pipeline import (_joint_ransac,
                                                        masked_median,
                                                        partition_by_class)
        from articulated_pose_tpu.pose.ransac import ransac_similarity

        # per-part buffers run at the part_points cap inside fit_frame
        Np = min(N, pose_cfg.part_points or N)
        W = jnp.asarray(rng.rand(B, N, K), jnp.float32)
        src = jnp.asarray(rng.rand(B, Np, 3), jnp.float32)
        tgt = jnp.asarray(rng.rand(B, Np, 3), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Np) < 0.5, jnp.float32)
        axis = jnp.asarray([0.0, 0.0, 1.0])
        keyb = jax.random.split(jax.random.PRNGKey(0), B)

        if on("partition"):
            timed("pose: partition_by_class",
                  lambda w: jax.vmap(
                      lambda x: partition_by_class(jnp.argmax(x, -1), K))(w),
                  W)
        if on("ransac1"):
            timed("pose: 1-part RANSAC",
                  lambda s, t, m: jax.vmap(
                      lambda a, b, c, k: ransac_similarity(
                          k, a, b, c, niter=pose_cfg.niter_part,
                          inlier_th=0.1, chunk=pose_cfg.ransac_chunk,
                          compact_mask=True))(s, t, m, keyb),
                  src, tgt, mask)
        if on("jhypo"):
            timed("pose: joint RANSAC (hypo+score)",
                  lambda s, t, m, s1, t1, m1: jax.vmap(
                      lambda a, b, c, a1, b1, c1, k: _joint_ransac(
                          k, a, b, c, a1, b1, c1, axis, pose_cfg, False)[1])(
                      s, t, m, s1, t1, m1, keyb),
                  src, tgt, mask, tgt, src, mask)
        if on("jrefit"):
            timed("pose: joint LM refit (full pts)",
                  lambda s, t, m: jax.vmap(
                      lambda a, b, c: joint_transformation_estimate(
                          a, b, c, b, a, c, axis,
                          lm_iters=pose_cfg.lm_iters_refit)[0])(s, t, m),
                  src, tgt, mask)
        if on("pscale"):
            timed("pose: pairwise_scale (full pts)",
                  lambda s, t, m: jax.vmap(umeyama.pairwise_scale)(s, t, m),
                  src, tgt, mask)
        if on("median"):
            timed("pose: masked_median axis",
                  lambda s, m: jax.vmap(masked_median)(s, m), src, mask)


if __name__ == "__main__":
    main()
