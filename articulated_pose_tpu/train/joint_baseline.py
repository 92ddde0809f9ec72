"""Train/eval driver for the direct joint-regression baseline.

Makes the reference's third experiment family CLI-drivable
(reference: lib/architecture.py:163-192 builds the model behind the
`joint_baseline` experiment ids of global_info.py, trained by the same
main.py loop; evaluation compares regressed joint parameters against the
7-dof GT).  Here: `main.py train/eval --model joint_baseline`.

The model regresses, per joint, (axis, orthogonal offset direction,
line distance) globally from the whole cloud — no per-point voting, no
pose fit.  Eval reports the sign-invariant axis angle error and the
offset-vector error against joint_params_gt (labeling.py:136-147).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from articulated_pose_tpu.config import NetworkConfig, bn_momentum_schedule
from articulated_pose_tpu.models.joint_regression import (
    DirectJointRegression, direct_joint_loss)
from articulated_pose_tpu.train.state import make_optimizer


class JointBaselineTrainer:
    """Minimal train/eval engine for DirectJointRegression."""

    def __init__(self, cfg: NetworkConfig, work_dir: str, model=None):
        self.cfg = cfg
        self.work_dir = work_dir
        # injectable model: any module returning {"joint_params": [(axis,
        # orth, dist), ...]} (tests drive the trainer mechanics with a
        # tiny stub; production always uses DirectJointRegression)
        self.model = model if model is not None else \
            DirectJointRegression(n_max_parts=cfg.n_max_parts)
        self.tx = make_optimizer(cfg)
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.step = 0
        self._jit_step = jax.jit(self._train_step)
        self._jit_fwd = jax.jit(self._forward)

    # -------------------------------------------------------------- state
    def _ckpt_path(self) -> str:
        return os.path.join(self.work_dir, "joint_baseline.msgpack")

    def init(self, example_P: np.ndarray) -> None:
        variables = self.model.init(jax.random.PRNGKey(self.cfg.seed),
                                    jnp.asarray(example_P))
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

    def save(self) -> None:
        import flax.serialization as ser

        os.makedirs(self.work_dir, exist_ok=True)
        blob = ser.msgpack_serialize(
            {"params": jax.device_get(self.params),
             "batch_stats": jax.device_get(self.batch_stats),
             "step": np.asarray(self.step)})
        with open(self._ckpt_path(), "wb") as f:
            f.write(blob)

    def maybe_restore(self, example_P: np.ndarray) -> int:
        import flax.serialization as ser

        self.init(example_P)
        path = self._ckpt_path()
        if not os.path.exists(path):
            return 0
        with open(path, "rb") as f:
            raw = ser.msgpack_restore(f.read())
        # restore by template to keep pytree types
        self.params = jax.tree.map(lambda t, v: jnp.asarray(v), self.params,
                                   raw["params"])
        self.batch_stats = jax.tree.map(lambda t, v: jnp.asarray(v),
                                        self.batch_stats, raw["batch_stats"])
        self.step = int(raw["step"])
        self.opt_state = self.tx.init(self.params)
        return self.step

    # -------------------------------------------------------------- steps
    def _train_step(self, params, batch_stats, opt_state, batch, step, rng):
        bn_mom = bn_momentum_schedule(step, self.cfg.batch_size,
                                      self.cfg.bn_decay_step)

        def loss_fn(p):
            out, mut = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["P"], train=True, bn_momentum=bn_mom,
                mutable=["batch_stats"], rngs={"dropout": rng})
            parts = direct_joint_loss(out, batch["joint_params_gt"])
            total = sum(jnp.mean(v) for v in parts.values())
            return total, (mut["batch_stats"], parts)

        (total, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda a, b: a + b, params, updates)
        logs = {"total_loss": total,
                **{k: jnp.mean(v) for k, v in parts.items()}}
        return new_params, new_stats, new_opt, logs

    def _forward(self, params, batch_stats, P):
        return self.model.apply({"params": params, "batch_stats": batch_stats},
                                P, train=False)

    # ---------------------------------------------------------------- fit
    def fit(self, train_it, max_steps: Optional[int] = None,
            n_epochs: Optional[int] = None) -> Dict[str, float]:
        max_steps = max_steps or (len(train_it) * (n_epochs or 1))
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        logs = {}
        done = False
        while not done:
            for batch in train_it:
                if self.params is None:
                    self.init(batch["P"][:1])
                rng, sub = jax.random.split(rng)
                self.params, self.batch_stats, self.opt_state, logs = \
                    self._jit_step(self.params, self.batch_stats,
                                   self.opt_state, batch,
                                   jnp.asarray(self.step), sub)
                self.step += 1
                if self.step >= max_steps:
                    done = True
                    break
        self.save()
        return {k: float(v) for k, v in logs.items()}

    # --------------------------------------------------------------- eval
    def evaluate(self, test_it) -> Dict[str, float]:
        """Mean joint-parameter errors over a split.

        axis_err_deg: sign-invariant angle between predicted and GT axis
        (eval_joint_params.py semantics); offset_err: |p̂ − p| of the
        orthogonal offset vector (orth_unit · dist, labeling.py:144-147).
        """
        axis_errs, offset_errs = [], []
        for batch in test_it:
            pred = self._jit_fwd(self.params, self.batch_stats,
                                 jnp.asarray(batch["P"]))
            gt = np.asarray(batch["joint_params_gt"])     # (B, K, 7)
            for j, jp in enumerate(pred["joint_params"]):
                a_hat = np.asarray(jp[0])
                a_hat = a_hat / np.maximum(
                    np.linalg.norm(a_hat, axis=1, keepdims=True), 1e-9)
                a_gt = gt[:, j + 1, 0:3]
                valid = np.linalg.norm(a_gt, axis=1) > 1e-6
                cosang = np.abs(np.sum(a_hat * a_gt, axis=1)
                                / np.maximum(np.linalg.norm(a_gt, axis=1),
                                             1e-9))
                axis_errs.extend(
                    np.degrees(np.arccos(np.clip(cosang, -1, 1)))[valid])
                p_hat = np.asarray(jp[1]) * np.asarray(jp[2])
                p_gt = gt[:, j + 1, 3:6] * gt[:, j + 1, 6:7]
                offset_errs.extend(
                    np.linalg.norm(p_hat - p_gt, axis=1)[valid])
        return {"joint_axis_err_deg": float(np.mean(axis_errs)),
                "joint_offset_err": float(np.mean(offset_errs)),
                "n_joints_evaluated": len(axis_errs)}


def run_joint_baseline(cfg: NetworkConfig, work_dir: str, train_it=None,
                       test_it=None, max_steps: Optional[int] = None,
                       n_epochs: Optional[int] = None) -> Dict[str, float]:
    """Train (if train_it) then evaluate (if test_it); returns metrics."""
    tr = JointBaselineTrainer(cfg, work_dir)
    out: Dict[str, float] = {}
    first = None
    it = train_it or test_it
    for batch in it:
        first = batch["P"][:1]
        break
    resumed = tr.maybe_restore(first)
    out["resumed_step"] = resumed
    if train_it is not None:
        out.update(tr.fit(train_it, max_steps=max_steps, n_epochs=n_epochs))
    if test_it is not None:
        metrics = tr.evaluate(test_it)
        out.update(metrics)
        os.makedirs(work_dir, exist_ok=True)
        with open(os.path.join(work_dir, "joint_baseline_eval.json"),
                  "w") as f:
            json.dump(metrics, f, indent=1)
    return out
