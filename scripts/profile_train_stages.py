"""Stage-level profile of the TRAINING step (VERDICT r3 weak item 7:
inference had three optimization rounds; training throughput (283-360
clouds/s in the e2e sweeps) never had a stage table of its own).

Times, each in its own scan-fused single-dispatch window (bench.py
pattern — per-dispatch tunnel latency amortizes out):

  data gen          on-device synthetic batch (what the e2e runs train on)
  fwd+loss          _forward_loss value only (no grad)
  grad              value_and_grad of _forward_loss
  grad+update       full optimizer step on a fixed batch
  fused step        gen + grad + update (= the e2e training program)

Shapes default to the e2e sweep recipe (B=32, N=1024); pass
--batch 64 --points 2048 for the flagship bench shape.

  python scripts/profile_train_stages.py
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--category", default="eyeglasses")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.device_synthetic import (
        DeviceSynthetic, make_fused_synthetic_train_step)
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.registry import get_category
    from articulated_pose_tpu.train import state as state_lib

    spec = get_category(args.category)
    K = spec.n_parts
    B, N = args.batch, args.points
    cfg = NetworkConfig(n_max_parts=K, num_points=N, batch_size=B,
                        val_interval=0, snapshot_interval=0)
    model = build_model(cfg)
    state = state_lib.create_train_state(
        model, cfg, jax.random.PRNGKey(0), np.zeros((1, N, 3), np.float32))

    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=tuple(spec.joint_types), seed=1)
    dg = DeviceSynthetic(gen, num_points=N, noise=0.005)

    sample = jax.jit(lambda k: dg.sample_batch(k, B))
    batch0, _ = sample(jax.random.PRNGKey(5))
    batch0 = jax.tree.map(jnp.asarray, batch0)

    def report(name, dt):
        print(f"{name:<28s} {dt*1e3:9.3f} ms/iter "
              f"{B/dt:10.0f} clouds/s", flush=True)

    # ---- data gen ------------------------------------------------------
    @jax.jit
    def w_gen(key):
        def body(acc, i):
            b, _ = dg.sample_batch(jax.random.fold_in(key, i), B)
            return acc + jnp.sum(b["P"]), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(args.iters))
        return acc
    _ = float(w_gen(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    _ = float(w_gen(jax.random.PRNGKey(2)))
    report("data gen", (time.perf_counter() - t0) / args.iters)

    # ---- fwd+loss / grad on a fixed batch (carry-perturbed) -------------
    def loss_of(params, batch, rng):
        total, _ = state_lib._forward_loss(
            params, state.batch_stats, state.apply_fn, batch, cfg,
            train=True, rng=rng, step=state.step)
        return total

    def make_w(fn):
        @jax.jit
        def w(params, batch, key):
            def body(acc, i):
                eps = 1e-30 * acc
                b = jax.tree.map(
                    lambda a: a + eps.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)
                out = fn(params, b, jax.random.fold_in(key, i))
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree.leaves(out)), None
            acc, _ = jax.lax.scan(body, jnp.ones((), jnp.float32),
                                  jnp.arange(args.iters))
            return acc
        return w

    for name, fn in [
        ("fwd+loss (no grad)", lambda p, b, k: loss_of(p, b, k)),
        ("grad", lambda p, b, k: jax.grad(loss_of)(p, b, k)),
    ]:
        w = make_w(fn)
        _ = float(w(state.params, batch0, jax.random.PRNGKey(3)))
        t0 = time.perf_counter()
        _ = float(w(state.params, batch0, jax.random.PRNGKey(4)))
        report(name, (time.perf_counter() - t0) / args.iters)

    # ---- full optimizer step on a fixed batch ----------------------------
    base_step = state_lib.make_train_step(cfg, jit=False)

    @jax.jit
    def w_step(state, batch, key):
        def body(st, i):
            st, m = base_step(st, batch, jax.random.fold_in(key, i))
            return st, None
        st, _ = jax.lax.scan(body, state, jnp.arange(args.iters))
        # depend on the params, not just the step counter — returning
        # st.step alone lets XLA dead-code-eliminate the whole grad+
        # update chain (measured: 3 ms vs the 2700 ms the grad actually
        # costs on the CPU smoke shape)
        return st.step, sum(jnp.sum(p.astype(jnp.float32))
                            for p in jax.tree.leaves(st.params))
    _ = jax.block_until_ready(w_step(state, batch0, jax.random.PRNGKey(6)))
    t0 = time.perf_counter()
    _ = jax.block_until_ready(w_step(state, batch0, jax.random.PRNGKey(7)))
    report("grad+update (fixed batch)", (time.perf_counter() - t0) / args.iters)

    # ---- the real e2e program: fused gen + grad + update ----------------
    fused = make_fused_synthetic_train_step(cfg, dg, B,
                                            steps_per_call=args.iters)
    st2, _ = fused(state, jax.random.PRNGKey(8))
    st2 = jax.block_until_ready(st2)
    t0 = time.perf_counter()
    st3, _ = fused(st2, jax.random.PRNGKey(9))
    st3 = jax.block_until_ready(st3)
    report("fused step (e2e program)", (time.perf_counter() - t0) / args.iters)


if __name__ == "__main__":
    main()
