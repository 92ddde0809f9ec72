"""Training engine tests: loss decreases, finite-grad guard, checkpoint
round-trip, and the multi-chip sharded step on the virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulated_pose_tpu.config import NetworkConfig
from articulated_pose_tpu.data.batcher import BatchIterator
from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.models.ancsh import ANCSHModel
from articulated_pose_tpu.models.pointnet2 import BackboneSpec
from articulated_pose_tpu.train.state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

TINY = BackboneSpec(
    sa_npoints=(32, 16), sa_radii=(0.25, 0.5), sa_nsamples=(8, 8),
    sa_mlps=((16, 16), (16, 32)), global_mlp=(32, 64),
    fp_mlps=((32,), (32,), (16, 16)), head_width=16,
)


def tiny_setup(n_parts=3, batch=4, num_points=64, mixed=True):
    cfg = NetworkConfig(
        n_max_parts=n_parts, num_points=num_points, batch_size=batch,
        nocs_type="ancsh" if mixed else "npcs",
        pred_joint=mixed, pred_joint_ind=mixed,
        decay_step=10**9, bn_decay_step=10**9, val_interval=0,
        snapshot_interval=0)
    model = ANCSHModel(n_max_parts=n_parts, mixed=mixed, pred_joint=mixed,
                       backbone_spec=TINY)
    gen = SyntheticArticulated(n_parts=n_parts, points_per_part=100, seed=0)
    batch_np, _ = gen.batch(np.random.RandomState(0), batch,
                            num_points=num_points,
                            nocs_type="AC" if mixed else "A")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch_np["P"])
    return cfg, model, state, batch_np


@pytest.fixture(scope="module")
def shared_step():
    """One (cfg, model, state, batch, compiled step) shared by every
    test in this module that doesn't need a different config: the ANCSH
    train-step compile costs ~30s on a 1-core host, so the fast tier
    pays it once (tests use the state functionally and never mutate the
    fixture's copy).  batch=8 so the sharding tests can reuse it on the
    data=4 mesh axis."""
    cfg, model, state, batch = tiny_setup(batch=8)
    step = make_train_step(cfg, donate=False)
    return cfg, model, state, batch, step


class TestTrainStep:
    def test_loss_decreases(self, shared_step):
        cfg, model, state, batch, step = shared_step
        rng = jax.random.PRNGKey(1)
        state, m0 = step(state, batch, rng)
        first = float(m0["total_loss"])
        for _ in range(30):
            state, m = step(state, batch, rng)
        last = float(m["total_loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.8, (first, last)

    def test_npcs_mode(self):
        cfg, model, state, batch = tiny_setup(mixed=False)
        step = make_train_step(cfg, donate=False)
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert "total_gocs_loss" not in m
        assert np.isfinite(float(m["total_loss"]))

    def test_finite_grad_guard(self, shared_step):
        cfg, model, state, batch, step = shared_step
        bad = dict(batch)
        bad["nocs_gt"] = np.asarray(batch["nocs_gt"]) * np.nan
        params_before = jax.device_get(state.params)
        state2, m = step(state, bad, jax.random.PRNGKey(0))
        assert not bool(m["grads_finite"])
        # params unchanged under non-finite gradients
        after = jax.device_get(state2.params)
        for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_eval_step_deterministic(self):
        cfg, model, state, batch = tiny_setup(batch=2, num_points=32)
        ev = make_eval_step(cfg)
        p1, m1 = ev(state, batch)
        p2, m2 = ev(state, batch)
        np.testing.assert_array_equal(np.asarray(p1["W"]), np.asarray(p2["W"]))


class TestSharding:
    @pytest.mark.slow
    def test_multichip_train_step(self):
        # slow tier: strictly subsumed by
        # test_sharded_step_matches_single_device (same shapes, same
        # data=4,model=2 mesh, which also asserts numerical equality and
        # now carries this test's shard-shape check)
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        from articulated_pose_tpu.parallel.mesh import make_mesh, shard_train_setup

        cfg, model, state, batch = tiny_setup(batch=8, num_points=64)
        mesh = make_mesh("data=4,model=2")
        step = make_train_step(cfg, jit=False)
        sharded_step, placed, b_sh = shard_train_setup(step, state, mesh)
        batch_dev = jax.device_put(batch, b_sh)
        new_state, metrics = sharded_step(placed, batch_dev, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        # batch really is sharded over the data axis: each device holds B/4
        shard_shape = batch_dev["P"].sharding.shard_shape(batch_dev["P"].shape)
        assert shard_shape[0] == 2  # 8 / data-axis size 4

    def test_sharded_step_matches_single_device(self, shared_step):
        """dp×tp sharded train step == single-device step numerically.

        Same initial state, batch, and PRNG through (a) the plain jitted
        step and (b) the GSPMD-sharded step on a data=4,model=2 mesh —
        loss, grad norm, and BN batch stats must agree to float32
        collective-reduction tolerance.  A psum/TP-pattern regression
        that still produces finite numbers fails here (VERDICT r3 #3).
        """
        assert jax.device_count() >= 8
        from articulated_pose_tpu.parallel.mesh import make_mesh, shard_train_setup

        # the module fixture's compiled plain step is the single-device
        # reference (B=8 divides the data=4 mesh axis)
        cfg, model, state, batch, step = shared_step
        # host-side copy so the donated sharded run can't alias the
        # single-device run's inputs
        state_host = jax.tree.map(np.asarray, jax.device_get(state))
        new1, m1 = step(state, batch, jax.random.PRNGKey(3))

        # apply_fn/tx are static (non-leaf) fields, preserved by tree.map
        state2 = jax.tree.map(jnp.asarray, state_host)
        mesh = make_mesh("data=4,model=2")
        sharded_step, placed, b_sh = shard_train_setup(
            make_train_step(cfg, jit=False), state2, mesh)
        batch_dev = jax.device_put(batch, b_sh)
        new2, m2 = sharded_step(placed, batch_dev, jax.random.PRNGKey(3))

        # batch really is sharded over the data axis (from the subsumed
        # test_multichip_train_step): each device holds B/4
        shard_shape = batch_dev["P"].sharding.shard_shape(batch_dev["P"].shape)
        assert shard_shape[0] == 2
        np.testing.assert_allclose(float(m1["total_loss"]),
                                   float(m2["total_loss"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m2["grad_norm"]),
                                   rtol=1e-4, atol=1e-6)
        # BN batch stats are global-batch reductions under GSPMD
        for a, b in zip(jax.tree.leaves(jax.device_get(new1.batch_stats)),
                        jax.tree.leaves(jax.device_get(new2.batch_stats))):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_tp_param_actually_sharded(self):
        from articulated_pose_tpu.parallel.mesh import make_mesh, state_shardings

        cfg, model, state, batch = tiny_setup(batch=8, num_points=64)
        mesh = make_mesh("data=2,model=4")
        sh = state_shardings(state, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        tp = [s for path, s in flat
              if "sa_global" in "/".join(str(getattr(k, "key", k)) for k in path)
              and s.spec != jax.sharding.PartitionSpec()]
        # at least one global-stage kernel is tensor-sharded when wide enough
        # (the tiny test net is below threshold, so assert rule consistency)
        assert isinstance(sh.step.spec, jax.sharding.PartitionSpec)


class TestTrainer:
    def test_fit_and_checkpoint_resume(self, tmp_path):
        from articulated_pose_tpu.train.trainer import Trainer

        cfg, model, state, batch = tiny_setup(batch=4, num_points=64)
        cfg = cfg.replace(snapshot_interval=5)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        samples = [gen.frame(np.random.RandomState(i), num_points=64)[0]
                   for i in range(8)]
        data = BatchIterator(8, lambda i: samples[i], batch_size=4, seed=0)

        tr = Trainer(model, cfg, example_batch=batch, work_dir=str(tmp_path))
        out = tr.fit(data, max_steps=5, log_every=1)
        assert np.isfinite(out["total_loss"])
        assert tr.ckpt.latest_step() == 5

        tr2 = Trainer(model, cfg, example_batch=batch, work_dir=str(tmp_path))
        resumed = tr2.maybe_restore()
        assert resumed == 5
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(tr2.state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_save_payload_is_host_materialized(self, tmp_path, monkeypatch):
        """Checkpointer.save must hand Orbax HOST (numpy) arrays, never
        device jax.Arrays, so the device->host transfer is the
        main-thread jax.device_get path every eval uses rather than
        Orbax's background-thread serialization (round-5 hardening
        during the cross-epoch checkpoint investigation —
        docs/perf_round5.md).  This pins the device_get in save()."""
        from articulated_pose_tpu.train.trainer import Checkpointer

        cfg, model, state, batch = tiny_setup(batch=2, num_points=64)
        ck = Checkpointer(str(tmp_path / "model"))
        captured = {}
        real_save = ck.mgr.save

        def spy(step, args=None, **kw):
            captured["leaves"] = jax.tree.leaves(getattr(args, "item", args))
            return real_save(step, args=args, **kw)

        monkeypatch.setattr(ck.mgr, "save", spy)
        ck.save(0, state)
        assert captured["leaves"], "spy saw no payload"
        bad = [type(l).__name__ for l in captured["leaves"]
               if isinstance(l, jax.Array)]
        assert not bad, f"device arrays handed to Orbax: {bad}"

    def test_validate(self, tmp_path):
        from articulated_pose_tpu.train.trainer import Trainer

        cfg, model, state, batch = tiny_setup(batch=4, num_points=64)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        samples = [gen.frame(np.random.RandomState(i), num_points=64)[0]
                   for i in range(4)]
        data = BatchIterator(4, lambda i: samples[i], batch_size=4, seed=0,
                             shuffle=False)
        tr = Trainer(model, cfg, example_batch=batch, work_dir=str(tmp_path))
        vm = tr.validate(data)
        assert np.isfinite(vm["total_loss"])

    def test_validate_saves_predictions_and_gc(self, tmp_path):
        from articulated_pose_tpu.train.trainer import Trainer

        cfg, model, state, batch = tiny_setup(batch=4, num_points=64)
        cfg = cfg.replace(val_prediction_n_keep=1)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        samples = [gen.frame(np.random.RandomState(i), num_points=64)[0]
                   for i in range(4)]
        data = BatchIterator(4, lambda i: samples[i], batch_size=4, seed=0,
                             shuffle=False)
        data.basenames = [f"f{i}" for i in range(4)]
        tr = Trainer(model, cfg, example_batch=batch, work_dir=str(tmp_path))
        tr.validate(data, save_predictions=True)
        import os
        d0 = os.path.join(str(tmp_path), "val_pred", "step0")
        assert os.path.exists(os.path.join(d0, "f0.h5"))
        # advance step and validate again: old dir GC'd (n_keep=1)
        tr.state = tr.state.replace(step=tr.state.step + 7)
        tr.validate(data, save_predictions=True)
        assert not os.path.exists(d0)
        assert os.path.exists(os.path.join(str(tmp_path), "val_pred", "step7"))


class TestTPSharding:
    def test_wide_global_kernel_sharded_on_model_axis(self):
        """A backbone wide enough to cross _TP_MIN_FEATURES really gets its
        global-stage kernels partitioned over the model axis."""
        from articulated_pose_tpu.parallel.mesh import make_mesh, state_shardings

        wide = BackboneSpec(
            sa_npoints=(16, 8), sa_radii=(0.25, 0.5), sa_nsamples=(8, 8),
            sa_mlps=((16,), (32,)), global_mlp=(64, 256), fp_mlps=((32,), (16,), (16,)),
            head_width=16)
        cfg = NetworkConfig(n_max_parts=2, num_points=64, batch_size=4,
                            nocs_type="npcs", pred_joint=False)
        model = ANCSHModel(n_max_parts=2, mixed=False, pred_joint=False,
                           backbone_spec=wide)
        gen = SyntheticArticulated(n_parts=2, points_per_part=100, seed=0)
        batch, _ = gen.batch(np.random.RandomState(0), 4, num_points=64,
                             nocs_type="A")
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch["P"])
        mesh = make_mesh("data=4,model=2")
        sh = state_shardings(state, mesh)
        k = sh.params["backbone"]["sa_global"]["mlp"]["conv1"]["dense"]["kernel"]
        assert k.spec == jax.sharding.PartitionSpec(None, "model"), k.spec
        # adam moments mirror the params sharding
        mu = jax.tree_util.tree_leaves_with_path(sh.opt_state)
        hit = [s for path, s in mu
               if "sa_global" in str(path) and "conv1" in str(path)
               and "kernel" in str(path)]
        assert any(s.spec == jax.sharding.PartitionSpec(None, "model")
                   for s in hit)
        # and a narrow layer stays replicated
        k0 = sh.params["backbone"]["sa1"]["mlp"]["conv0"]["dense"]["kernel"]
        assert k0.spec == jax.sharding.PartitionSpec()


class TestJointBaselineTrainer:
    """Direct joint-regression baseline: loss decreases and eval runs."""

    def test_fit_smoke(self, tmp_path):
        """Fast default tier: trainer MECHANICS (fit loop, loss decrease,
        msgpack checkpoint round-trip) on an injected tiny model — the
        full DirectJointRegression train-step compile costs ~2 min on a
        1-core host and is covered by the slow variant below plus the
        RUN_SLOW CLI round-trip; its forward+loss stay fast-tier in
        tests/test_aux.py::TestDirectJointRegression."""
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        from articulated_pose_tpu.config import load_config
        from articulated_pose_tpu.data.batcher import BatchIterator
        from articulated_pose_tpu.data.synthetic import SyntheticArticulated
        from articulated_pose_tpu.train.joint_baseline import (
            JointBaselineTrainer)

        class TinyJointReg(nn.Module):
            n_max_parts: int = 3

            @nn.compact
            def __call__(self, P, *, train=False, bn_momentum=0.9):
                x = jnp.mean(P, axis=1)                       # (B, 3)
                x = nn.Dense(16)(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=bn_momentum)(x)
                x = nn.relu(x)
                out = []
                for _ in range(self.n_max_parts - 1):
                    out.append((jnp.tanh(nn.Dense(3)(x)),
                                jnp.tanh(nn.Dense(3)(x)),
                                jax.nn.sigmoid(nn.Dense(1)(x))))
                return {"joint_params": out}

        cfg = load_config(None, category="eyeglasses", batch_size=4,
                          num_points=128, n_max_parts=3)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        rng = np.random.RandomState(0)
        frames = [gen.frame(rng, num_points=128, n_max_parts=3)[0]
                  for _ in range(4)]
        it = BatchIterator(4, lambda i: frames[i], 4, shuffle=True, seed=0,
                           drop_last=True)
        tr = JointBaselineTrainer(cfg, str(tmp_path), model=TinyJointReg())
        tr.init(frames[0]["P"][None])
        first = tr.fit(it, max_steps=2)
        out = tr.fit(it, max_steps=20)
        assert out["total_loss"] < first["total_loss"]
        tr2 = JointBaselineTrainer(cfg, str(tmp_path), model=TinyJointReg())
        assert tr2.maybe_restore(frames[0]["P"][None]) == 20

    @pytest.mark.slow
    def test_fit_reduces_loss_and_evaluates(self, tmp_path):
        from articulated_pose_tpu.config import load_config
        from articulated_pose_tpu.data.batcher import BatchIterator
        from articulated_pose_tpu.data.synthetic import SyntheticArticulated
        from articulated_pose_tpu.train.joint_baseline import (
            JointBaselineTrainer)

        cfg = load_config(None, category="eyeglasses", batch_size=4,
                          num_points=128, n_max_parts=3)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        rng = np.random.RandomState(0)
        frames = [gen.frame(rng, num_points=128, n_max_parts=3)[0]
                  for _ in range(8)]
        it = BatchIterator(8, lambda i: frames[i], 4, shuffle=True, seed=0,
                           drop_last=True)
        tr = JointBaselineTrainer(cfg, str(tmp_path))
        tr.init(frames[0]["P"][None])
        first = tr.fit(it, max_steps=2)
        out = tr.fit(it, max_steps=30)
        assert out["total_loss"] < first["total_loss"]
        metrics = tr.evaluate(it)
        assert np.isfinite(metrics["joint_axis_err_deg"])
        assert metrics["n_joints_evaluated"] > 0
        # round-trips through the msgpack checkpoint
        tr2 = JointBaselineTrainer(cfg, str(tmp_path))
        assert tr2.maybe_restore(frames[0]["P"][None]) == 30
