"""Training loop with checkpointing, validation and metrics.

Rebuild of the reference session loop (reference: lib/network.py:173-316):
per-step metrics, periodic seen/unseen validation with prediction dumps,
snapshotting every `snapshot_interval` steps keeping the newest 3, and
automatic resume from the latest checkpoint (reference: main.py:80-101).
Checkpoints are Orbax; metrics stream to a JSONL file (and TensorBoard if
available) instead of tf.summary.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from articulated_pose_tpu.config import NetworkConfig
from articulated_pose_tpu.data.batcher import device_prefetch
from articulated_pose_tpu.train.state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


class MetricLogger:
    """JSONL metrics stream (the tf.summary.FileWriter replacement)."""

    def __init__(self, log_dir: str, name: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(np.asarray(v))
            except Exception:
                pass
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class Checkpointer:
    """Orbax-backed snapshot/restore keeping the newest `n_keep`
    (reference: tf.train.Saver(max_to_keep=3), lib/network.py:93)."""

    def __init__(self, model_dir: str, n_keep: int = 3):
        import orbax.checkpoint as ocp

        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.model_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=n_keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState):
        import orbax.checkpoint as ocp

        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step}
        # Materialize on host (main thread) BEFORE handing to Orbax, so
        # the device->host transfer is the same jax.device_get path every
        # eval/report uses rather than Orbax's own background-thread
        # serialization.  Context (round 5, 2026-08-20): checkpoints
        # written before a tunnel wedge/recovery evaluated degraded in
        # fresh processes (seg 0.96 -> 0.68 on same-key frames), while
        # same-process AND same-epoch cross-process round-trips measured
        # bit-exact (max param/W delta 0.0) through both save paths —
        # docs/perf_round5.md has the full bisection matrix.  Checkpoints
        # should be consumed within the chip session-epoch that wrote
        # them, or validated against saved eval frames.
        payload = jax.device_get(payload)
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return state
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"],
                             opt_state=restored["opt_state"],
                             step=restored["step"])


class Trainer:
    """Drives train/val over compiled steps.

    `train_data` / `val_datas` are reusable iterables of batched numpy
    dicts (e.g. data.BatchIterator).
    """

    def __init__(self, model, config: NetworkConfig, rng=None,
                 example_batch: Optional[Dict] = None,
                 work_dir: Optional[str] = None):
        self.config = config
        self.model = model
        self.work_dir = work_dir or os.path.join(config.experiment_dir, config.nn_name)
        rng = rng if rng is not None else jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(rng)
        example = (example_batch["P"] if example_batch is not None
                   else np.zeros((1, config.num_points, 3), np.float32))
        self.state = create_train_state(model, config, init_rng, example)
        self.train_step = make_train_step(config)
        self.eval_step = make_eval_step(config)
        self.ckpt = Checkpointer(os.path.join(self.work_dir, "model"))
        self.logger = MetricLogger(os.path.join(self.work_dir, "log"), "train")
        self.val_loggers: Dict[int, MetricLogger] = {}

    def maybe_restore(self) -> int:
        self.state = self.ckpt.restore(self.state)
        return int(self.state.step)

    def fit(self, train_data: Iterable, val_datas: Iterable = (),
            n_epochs: Optional[int] = None, max_steps: Optional[int] = None,
            log_every: int = 50,
            on_validation: Optional[Callable] = None) -> Dict[str, float]:
        cfg = self.config
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        start = time.time()
        last_metrics: Dict[str, float] = {}
        # host-side step counter: reading state.step would force a device
        # sync every iteration and serialize the dispatch pipeline
        step = int(self.state.step)
        for epoch in range(1, n_epochs + 1):
            for batch in device_prefetch(train_data, size=2):
                self.state, metrics = self.train_step(self.state, batch, self.rng)
                step += 1
                if step % log_every == 0 or step == 1:
                    last_metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    self.logger.log(step, last_metrics)
                if cfg.val_interval and step % cfg.val_interval == 0:
                    for i, vd in enumerate(val_datas):
                        vm = self.validate(vd)
                        self.val_loggers.setdefault(
                            i, MetricLogger(os.path.join(self.work_dir, "log"),
                                            f"val{i + 1}")).log(step, vm)
                        if on_validation:
                            on_validation(i, step, vm)
                if cfg.snapshot_interval and step % cfg.snapshot_interval == 0:
                    self.ckpt.save(step, self.state)
                if max_steps is not None and step >= max_steps:
                    self.ckpt.save(step, self.state)
                    last_metrics["elapsed_s"] = time.time() - start
                    return last_metrics
        self.ckpt.save(int(self.state.step), self.state)
        last_metrics["elapsed_s"] = time.time() - start
        return last_metrics

    def validate(self, val_data: Iterable,
                 save_predictions: bool = False) -> Dict[str, float]:
        """Average metrics over a validation set; optionally dump per-frame
        prediction h5 files (reference lib/network.py:257-316) into
        val_pred/step<N>/ and GC old step dirs keeping
        config.val_prediction_n_keep (reference lib/network.py:245-255)."""
        sums: Dict[str, float] = {}
        n = 0
        save_dir = None
        basenames = list(getattr(val_data, "basenames", []))
        if save_predictions:
            save_dir = os.path.join(self.work_dir, "val_pred",
                                    f"step{int(self.state.step)}")
        for batch in device_prefetch(val_data, size=2):
            pred, metrics = self.eval_step(self.state, batch)
            bs = batch["P"].shape[0]
            if save_dir is not None:
                from articulated_pose_tpu.utils.prediction_io import (
                    save_batch_predictions)

                names = (basenames[n:n + bs] if len(basenames) >= n + bs
                         else [f"frame_{n + i}" for i in range(bs)])
                save_batch_predictions(jax.device_get(pred),
                                       {k: np.asarray(v) for k, v in batch.items()},
                                       names, save_dir)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(np.asarray(v)) * bs
            n += bs
        if save_dir is not None:
            self._gc_val_predictions()
        return {k: v / max(n, 1) for k, v in sums.items()}

    def _gc_val_predictions(self):
        """Keep only the newest val_prediction_n_keep step dirs."""
        import re
        import shutil

        n_keep = self.config.val_prediction_n_keep
        if n_keep == -1:
            return
        root = os.path.join(self.work_dir, "val_pred")
        if not os.path.isdir(root):
            return
        dirs = []
        for d in os.listdir(root):
            m = re.fullmatch(r"step(\d+)", d)
            if m and os.path.isdir(os.path.join(root, d)):
                dirs.append((int(m.group(1)), d))
        dirs.sort()
        for _, d in dirs[:-n_keep] if n_keep else dirs:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def predict(self, batch: Dict) -> Dict:
        pred, _ = self.eval_step(self.state, batch)
        return jax.device_get(pred)
