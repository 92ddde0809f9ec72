"""Per-layer gradient-fidelity diagnosis of the bf16 training collapse.

docs/dtype_ab.md localized the collapse to the trunk (bf16 trunk +
f32 heads still collapses: rot 4.6° → 20°).  On TPU a bf16×bf16 matmul
is exact-product/f32-accumulate, so matmul *precision* cannot be the
cause — the only rounding a bf16 trunk adds is (a) params cast to bf16
in the forward, (b) activations stored bf16 between layers, and (c) the
backward signal riding bf16 operands.  This script measures how much
those roundings corrupt the *gradient direction* at matched parameters:

  for each arm (f32 control, bf16 trunk, bf16 trunk + f32 heads):
      grads = d total_loss / d params   at the SAME f32 params,
                                        same batch, same dropout rng
  report per-top-level-module cosine(grad_arm, grad_f32) and norm ratio.

Runs on CPU (JAX_PLATFORMS=cpu) — CPU bf16 matmuls upcast operands to
f32 exactly like the MXU, so the rounding semantics match TPU.  Params
can come from init or from a trained f32 checkpoint (--work), where
gradients are smaller and rounding hurts proportionally more.

Usage:
  JAX_PLATFORMS=cpu python scripts/diag_bf16_grads.py \
      [--work /tmp/ab_f32_round3] [--batch 8] [--points 1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def flat_per_module(tree, depth=2):
    """{module path: 1-D concatenated vector} for a grad tree.

    Recurses `depth` levels into nested module dicts so the backbone's
    SA/FP stages report individually.
    """
    import jax

    out = {}
    for name, sub in tree.items():
        if depth > 1 and isinstance(sub, dict) and sub and all(
                isinstance(v, dict) for v in sub.values()):
            for sname, svec in flat_per_module(sub, depth - 1).items():
                out[f"{name}/{sname}"] = svec
        else:
            leaves = jax.tree.leaves(sub)
            out[name] = np.concatenate(
                [np.asarray(l, np.float64).ravel() for l in leaves])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=None,
                    help="train_synthetic_e2e work dir with a trained f32 "
                         "checkpoint; default = fresh init")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--parts", type=int, default=3)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--out", default=None, help="optional JSON dump path")
    ap.add_argument("--depth", type=int, default=2,
                    help="module-path depth for the per-module report "
                         "(4 reaches backbone/sa1/mlp/conv0)")
    ap.add_argument("--loss-key", default=None,
                    help="bisect ONE loss component's gradient instead of "
                         "the total (e.g. miou_loss, nocs_loss, index_loss)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from articulated_pose_tpu.config import NetworkConfig
    from articulated_pose_tpu.data.device_synthetic import DeviceSynthetic
    from articulated_pose_tpu.data.synthetic import SyntheticArticulated
    from articulated_pose_tpu.models.ancsh import build_model
    from articulated_pose_tpu.train.state import (_forward_loss,
                                                  create_train_state)

    K = args.parts
    joint_types = tuple(["revolute"] * (K - 1))

    def cfg_for(dtype, head_dtype=None, pool_dtype=None, act_dtype=None,
                f32_stages=()):
        return NetworkConfig(n_max_parts=K, num_points=args.points,
                             batch_size=args.batch, val_interval=0,
                             snapshot_interval=0, compute_dtype=dtype,
                             head_compute_dtype=head_dtype,
                             pool_compute_dtype=pool_dtype,
                             act_compute_dtype=act_dtype,
                             f32_stages=f32_stages)

    cfg32 = cfg_for("float32")
    gen = SyntheticArticulated(n_parts=K, points_per_part=500,
                               joint_types=joint_types, seed=0)
    dg = DeviceSynthetic(gen, num_points=args.points, noise=args.noise)

    model32 = build_model(cfg32)
    state = create_train_state(model32, cfg32, jax.random.PRNGKey(0),
                               np.zeros((1, args.points, 3), np.float32))
    src = "init"
    if args.work:
        from articulated_pose_tpu.train.trainer import Checkpointer
        ck = Checkpointer(os.path.join(args.work, "model"))
        if ck.latest_step() is not None:
            state = ck.restore(state)
            src = f"{args.work} @ step {int(state.step)}"
    print(f"params: {src}")

    batch, _ = jax.jit(lambda k: dg.sample_batch(k, args.batch))(
        jax.random.PRNGKey(7))
    drop_rng = jax.random.PRNGKey(11)

    arms = {
        "f32": cfg_for("float32"),
        "bf16": cfg_for("bfloat16"),
        "bf16_f32heads": cfg_for("bfloat16", "float32"),
        # interventions (round-3 bisect): f32 pre-pool activations only,
        # vs f32 activations everywhere (bf16 matmuls only)
        "bf16_f32pool": cfg_for("bfloat16", "float32",
                                pool_dtype="float32"),
        "bf16_f32act": cfg_for("bfloat16", "float32",
                               act_dtype="float32"),
        # the fix candidate: SA1 pinned f32, everything else bf16
        "bf16_f32sa1": cfg_for("bfloat16", f32_stages=("sa1",)),
        # round-4 residual-seg-damage bisect: the sa1 pin rescues pose
        # metrics but seg acc stays 0.833 vs 0.947 (docs/dtype_ab.md) —
        # these arms test whether also pinning the seg-head feed path
        # (fp3/fc1) or the second encoder stage recovers the rest
        "bf16_f32sa1fc1": cfg_for("bfloat16",
                                  f32_stages=("sa1", "fp3", "fc1")),
        "bf16_f32sa1sa2": cfg_for("bfloat16", f32_stages=("sa1", "sa2")),
        "bf16_f32enc": cfg_for("bfloat16",
                               f32_stages=("sa1", "sa2", "sa_global")),
    }
    # attribution arms: pure-f32 compute, but gradients TAKEN AT perturbed
    # params — isolates the parameter-quantization effect from every
    # activation/matmul rounding.  "f32@bf16params" quantizes each param
    # to its bf16 neighbor; "f32@jitterparams" applies a random relative
    # perturbation of bf16-cast magnitude (2^-9 relative, uniform) to
    # check whether ANY perturbation of that size decorrelates the init
    # gradient (curvature), or only the deterministic cast does.
    def cast_like_bf16(p):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16).astype(jnp.float32), p)

    def jitter(p, key):
        leaves, treedef = jax.tree.flatten(p)
        keys = jax.random.split(key, len(leaves))
        out = [a * (1.0 + (2.0 ** -9) * jax.random.uniform(
            k, a.shape, jnp.float32, -1.0, 1.0)) for a, k in zip(leaves, keys)]
        return jax.tree.unflatten(treedef, out)

    param_arms = {
        "f32@bf16params": cast_like_bf16(state.params),
        "f32@jitterparams": jitter(state.params, jax.random.PRNGKey(3)),
    }

    if args.loss_key:
        # gradient of ONE loss component (e.g. --loss-key miou_loss for
        # the seg term): localizes which module corrupts WHICH loss
        from articulated_pose_tpu import losses as losses_lib
        from articulated_pose_tpu.train.state import (_gt_from_batch,
                                                      bn_momentum_schedule)

        def component_loss(p, cfg, model):
            bn_m = bn_momentum_schedule(state.step, cfg.batch_size,
                                        cfg.bn_decay_step)
            pred, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["P"], train=True, bn_momentum=bn_m,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"])
            gt = _gt_from_batch(batch)
            ld = losses_lib.compute_all_losses(pred, gt, cfg)
            return jnp.mean(ld[args.loss_key])

    grads, losses = {}, {}
    for name, cfg in arms.items():
        model = build_model(cfg)
        if args.loss_key:
            gfn = jax.jit(jax.grad(
                lambda p, cfg=cfg, model=model: component_loss(
                    p, cfg, model)))
        else:
            gfn = jax.jit(jax.grad(
                lambda p: _forward_loss(p, state.batch_stats, model.apply,
                                        batch, cfg, train=True, rng=drop_rng,
                                        step=state.step)[0]))
        g = gfn(state.params)
        loss = _forward_loss(state.params, state.batch_stats, model.apply,
                             batch, cfg, train=True, rng=drop_rng,
                             step=state.step)[0]
        grads[name] = flat_per_module(g, args.depth)
        losses[name] = float(loss)
        print(f"  {name}: loss {losses[name]:.6f}")
        if name == "f32":
            for pname, params in param_arms.items():
                grads[pname] = flat_per_module(gfn(params), args.depth)
                losses[pname] = float("nan")
                print(f"  {pname}: (grad at perturbed params)")
    arms = dict(arms, **{k: arms["f32"] for k in param_arms})

    ref = grads["f32"]
    report = {"params": src, "losses": losses, "modules": {}}
    print(f"\n{'module':28s} {'arm':14s} {'cosine':>8s} {'|g|/|g32|':>10s}")
    for mod in sorted(ref):
        r = ref[mod]
        rn = np.linalg.norm(r)
        for arm in [a for a in arms if a != "f32"]:
            v = grads[arm][mod]
            cos = float(np.dot(r, v) / (rn * np.linalg.norm(v) + 1e-30))
            ratio = float(np.linalg.norm(v) / (rn + 1e-30))
            report["modules"].setdefault(mod, {})[arm] = {
                "cosine": cos, "norm_ratio": ratio}
            print(f"{mod:28s} {arm:14s} {cos:8.4f} {ratio:10.4f}")
    # whole-tree cosine
    for arm in [a for a in arms if a != "f32"]:
        r = np.concatenate([ref[m] for m in sorted(ref)])
        v = np.concatenate([grads[arm][m] for m in sorted(ref)])
        cos = float(np.dot(r, v) /
                    (np.linalg.norm(r) * np.linalg.norm(v) + 1e-30))
        report[f"overall_cosine_{arm}"] = cos
        print(f"\noverall cosine {arm}: {cos:.5f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
