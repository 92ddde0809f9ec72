"""End-to-end benchmark: 2048-pt ANCSH forward + on-device pose fit.

Measures point clouds/sec/chip for the BASELINE.json headline metric
(forward pass of the full ANCSH model on 2048-point clouds followed by
the per-part RANSAC + joint-constrained pose fit, all on device).

The measurement window is ONE dispatch: all --iters iterations run
inside a single jitted lax.scan (the steps_per_call pattern from
data/device_synthetic.py), so per-dispatch tunnel latency — which can
swing by ~1000x minute-to-minute on the axon tunnel — amortizes to
nothing instead of dominating the measurement (round-1 lesson: 5
host-driven dispatches recorded 4 clouds/s while the same computation
sustained ~500 inside scan-fused training).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clouds/sec", "vs_baseline": N}

vs_baseline is measured against the driver-set north star of 10,000
clouds/sec/chip (the reference publishes no numbers — BASELINE.md), so
vs_baseline = value / 10000.
"""

import argparse
import json
import time

import numpy as np

# NOTE: do NOT enable JAX's persistent compilation cache here — on the
# tunneled axon TPU platform, cache-deserialized executables dispatch
# through a path ~600x slower than freshly compiled ones (measured:
# 0.05ms vs 31ms for the same FPS program).  Always compile fresh.

# Analytic forward FLOPs at B=1, N=2048 for the flagship model (matmul
# 2*m*n*k over all conv/MLP stages), used for the utilization estimate.
FLOPS_PER_CLOUD = 1.2e9


def measure_chip_tflops(jax, jnp):
    """bf16 matmul roofline of whatever chip the driver provides."""
    n, iters = 4096, 32

    @jax.jit
    def chain(x):
        def body(y, _):
            return y @ x / float(n), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    x = jnp.asarray(np.random.RandomState(1).rand(n, n), jnp.bfloat16)
    _ = float(chain(x))  # compile + warm
    t0 = time.perf_counter()
    _ = float(chain(x))
    dt = time.perf_counter() - t0
    return 2 * n**3 * iters / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64,
                    help="64 measured best in a PAIRED same-process sweep "
                         "(scripts/ab_batch.py: 1811 vs 1603 clouds/s at 128; "
                         "earlier cross-window readings that favored 128 were "
                         "chip-drift artifacts)")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=64,
                    help="iterations fused into one scan window (the window's"
                         " one-scalar D2H fetch costs ~30 ms through the axon"
                         " tunnel, ~0.5 ms/iter at 64 iters)")
    ap.add_argument("--niter-part", type=int, default=128,
                    help="accuracy-flat down to 128 even at 30%% seg flips "
                         "(scripts/ab_ransac_strength.py)")
    ap.add_argument("--niter-joint", type=int, default=64)
    ap.add_argument("--impl", choices=["xla", "pallas"], default="pallas",
                    help="FPS kernel tier (pallas = TPU native; falls back"
                         " to xla off-TPU)")
    ap.add_argument("--bq-impl", choices=["xla", "pallas", "stream"],
                    default="pallas",
                    help="ball-query tier; the Pallas rank-select kernel"
                         " measured fastest at L1 (perf_round2.md)")
    ap.add_argument("--three-nn-impl", choices=["xla", "pallas"],
                    default="pallas",
                    help="three_nn tier (pallas fused kernel: 3.1 vs 4.3 ms"
                         " XLA at the FP1 shape)")
    ap.add_argument("--exact-ballq", action="store_true",
                    help="disable the packed butterfly planes (packed is the "
                         "inference default: SA1 4.96 -> 3.55 ms; idx/cnt "
                         "exact, coords within extent/2046 — perf_round3.md)")
    ap.add_argument("--skip-pose", action="store_true")
    ap.add_argument("--pose-random", action="store_true",
                    help="diagnostic: feed the pose stage random tensors "
                         "instead of the forward's outputs (still runs the "
                         "forward) — isolates forward->pose coupling cost")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.models.ancsh import ANCSHModel
    from articulated_pose_tpu.models.pointnet2 import BackboneSpec
    from articulated_pose_tpu.pose.pipeline import PoseFitConfig, fit_frame_batch

    B, N, K = args.batch, args.points, 3
    model = ANCSHModel(
        n_max_parts=K, mixed=True, pred_joint=True, dtype=jnp.bfloat16,
        backbone_spec=BackboneSpec(fps_impl=args.impl,
                                   ball_query_impl=args.bq_impl,
                                   ball_query_packed=not args.exact_ballq,
                                   three_nn_impl=args.three_nn_impl))
    rng = jax.random.PRNGKey(0)
    P = jnp.asarray(np.random.RandomState(0).rand(B, N, 3), jnp.float32)
    variables = model.init(rng, P)

    # library defaults carry the accuracy-A/B'd settings (refit iters,
    # refit-point cap, scoring prefix — see PoseFitConfig docstrings)
    pose_cfg = PoseFitConfig(
        n_parts=K, niter_part=args.niter_part, niter_joint=args.niter_joint,
        joint_types=("revolute", "revolute"), ransac_chunk=None)

    def one_iter(variables, Pi, key):
        pred = model.apply(variables, Pi, train=False)
        if args.skip_pose:
            out = (pred["W"], pred["nocs_per_point"])
        else:
            pose_pred = {
                "W": pred["W"],
                "nocs_per_point": pred["nocs_per_point"],
                "joint_axis_per_point": pred["joint_axis_per_point"],
                "index_per_point": pred["index_per_point"],
            }
            if args.pose_random:
                kr = jax.random.fold_in(key, 7)
                fwd_tag = sum(jnp.sum(l.astype(jnp.float32))
                              for l in jax.tree.leaves(pose_pred))
                pose_pred = {
                    k: jax.random.uniform(jax.random.fold_in(kr, i),
                                          v.shape, jnp.float32)
                    for i, (k, v) in enumerate(sorted(pose_pred.items()))}
            fits = fit_frame_batch(pose_pred, Pi, key, pose_cfg)
            out = (fits["baseline_R"], fits.get("nonlinear_R"))
            if args.pose_random:
                out = out + (fwd_tag,)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(out) if l is not None)

    # params are ARGUMENTS, not closure captures: closure-captured
    # variables get baked into the program as constants, which measured
    # ~200x slower end to end (and minutes of extra compile time).
    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def window(variables, P, key, iters):
        def body(carry, i):
            acc, key = carry
            key, kp, kf = jax.random.split(key, 3)
            # fresh input per iter (new clouds, defeats CSE across steps)
            Pi = P + 0.01 * jax.random.normal(kp, P.shape, P.dtype)
            acc = acc + one_iter(variables, Pi, kf)
            return (acc, key), None
        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), key), None, length=iters)
        return acc

    # warmup/compile with the measurement iteration count (static arg)
    key = jax.random.PRNGKey(1)
    _ = float(window(variables, P, key, args.iters))

    t0 = time.perf_counter()
    acc = window(variables, P, jax.random.PRNGKey(2), args.iters)
    _ = float(acc)  # host fetch = real synchronization barrier
    dt = time.perf_counter() - t0
    clouds_per_sec = B * args.iters / dt

    # calibrate what this tunneled chip actually delivers (the dev slice
    # measures ~2-3 bf16 TFLOPs vs ~459 for a production v5p chip), so
    # the recorded number carries its hardware context.
    tflops = measure_chip_tflops(jax, jnp)
    mxu_util = clouds_per_sec * FLOPS_PER_CLOUD / (tflops * 1e12)

    print(json.dumps({
        "metric": "point clouds/sec/chip (2048-pt ANCSH forward+pose fit)",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec",
        "vs_baseline": round(clouds_per_sec / 10000.0, 4),
        "impl": args.impl,
        "iters_fused": args.iters,
        "chip_bf16_tflops_measured": round(tflops, 2),
        "fwd_flops_utilization": round(mxu_util, 4),
        "note": ("single-dispatch lax.scan window (tunnel latency amortized); "
                 "dev chip measures the reported bf16 TFLOPs vs ~197 peak "
                 "production v5e / ~459 v5p. The pipeline is selection/"
                 "gather-bound (VPU+VMEM), not MXU-bound, so throughput "
                 "scales with vector/memory bandwidth across chips, not "
                 "peak matmul TFLOPs. vs_baseline conservatively divides "
                 "the PER-CHIP value by the full 10k north star, but "
                 "BASELINE.json's target is pod-slice: >=10k clouds/s on a "
                 "v5p-8 (4 chips / 8 cores) = 1250/core, which the pipeline "
                 "is embarrassingly data-parallel over (parallel/mesh.py; "
                 "sharded serving tested) — see docs/roofline_r4.md for the "
                 "measured per-chip floors and the pod-slice accounting"),
    }))


if __name__ == "__main__":
    main()
