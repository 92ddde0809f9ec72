"""Train state + compiled train/eval steps.

Rebuild of the reference training engine core (reference:
lib/network.py:95-171,385-407) as one jit-compiled step:

- optax Adam with the staircase exponential LR schedule in sample units,
- scheduled batch-norm EMA momentum threaded into the model,
- finite-gradient guard: the whole update is skipped when any gradient
  is non-finite (optax.apply_if_finite, mirroring lib/network.py:95-114),
- loss assembly with the reference multipliers (losses.collect_losses).

Everything is a pure function of (state, batch, rng); the driver decides
sharding (see parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from articulated_pose_tpu import losses as losses_lib
from articulated_pose_tpu.config import NetworkConfig, bn_momentum_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)


def make_optimizer(config: NetworkConfig) -> optax.GradientTransformation:
    def lr(step):
        samples = step * config.batch_size
        return config.init_learning_rate * jnp.power(
            config.decay_rate, jnp.floor(samples / config.decay_step))

    # apply_if_finite skips the update (and keeps Adam moments untouched)
    # when any gradient is inf/nan — the reference's tf.cond guard.
    return optax.apply_if_finite(optax.adam(learning_rate=lr), max_consecutive_errors=10**6)


def create_train_state(model, config: NetworkConfig, rng, example_input) -> TrainState:
    variables = model.init(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _forward_loss(params, batch_stats, apply_fn, batch: Dict[str, jax.Array],
                  config: NetworkConfig, *, train: bool, rng=None, step=0):
    bn_momentum = bn_momentum_schedule(step, config.batch_size, config.bn_decay_step)
    variables = {"params": params, "batch_stats": batch_stats}
    gt = _gt_from_batch(batch)
    if train:
        pred, new_vars = apply_fn(
            variables, batch["P"], train=True, bn_momentum=bn_momentum,
            rngs={"dropout": rng}, mutable=["batch_stats"])
    else:
        pred = apply_fn(variables, batch["P"], train=False)
        new_vars = {"batch_stats": batch_stats}
    loss_dict = losses_lib.compute_all_losses(pred, gt, config)
    total, summaries = losses_lib.collect_losses(loss_dict, config)
    return total, (summaries, new_vars["batch_stats"], pred)


def _gt_from_batch(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Device-side version of data.labeling.to_gt_dict."""
    gt = {
        "nocs_per_point": batch["nocs_gt"],
        "cls_per_point": batch["cls_gt"].astype(jnp.int32),
        "mask_array_per_point": batch["mask_array"],
    }
    if "heatmap_gt" in batch:
        gt.update({
            "heatmap_per_point": batch["heatmap_gt"],
            "unitvec_per_point": batch["unitvec_gt"],
            "orient_per_point": batch["orient_gt"],
            "index_per_point": batch["joint_cls_gt"].astype(jnp.int32),
            "joint_cls_mask": batch["joint_cls_mask"],
            "joint_params_gt": batch["joint_params_gt"],
        })
    if "nocs_gt_g" in batch:
        gt["gocs_per_point"] = batch["nocs_gt_g"]
    return gt


def make_train_step(config: NetworkConfig, *, jit: bool = True,
                    donate: bool = True):
    """Build the compiled train step: (state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (total, (summaries, new_bs, _)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, batch, config,
            train=True, rng=rng, step=state.step)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = dict(summaries)
        metrics["grads_finite"] = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        # global grad norm: training-health signal, and the quantity the
        # multichip-equivalence checks compare against the single-device
        # step (tests/test_train.py, __graft_entry__.dryrun_multichip)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if jit:
        return jax.jit(train_step,
                       donate_argnums=(0,) if donate else ())
    return train_step


def make_eval_step(config: NetworkConfig, *, jit: bool = True):
    """(state, batch) -> (pred_dict, metrics). No parameter mutation."""

    def eval_step(state: TrainState, batch):
        total, (summaries, _, pred) = _forward_loss(
            state.params, state.batch_stats, state.apply_fn, batch, config,
            train=False, step=state.step)
        return pred, summaries

    return jax.jit(eval_step) if jit else eval_step
