"""Serving API tests: checkpoint load + fused predict-and-fit call."""

import numpy as np
import pytest

import jax

from articulated_pose_tpu.config import NetworkConfig
from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.models.ancsh import ANCSHModel
from articulated_pose_tpu.models.pointnet2 import BackboneSpec
from articulated_pose_tpu.serving import PosePredictor
from articulated_pose_tpu.train.state import create_train_state
from articulated_pose_tpu.train.trainer import Checkpointer

TINY = BackboneSpec(
    sa_npoints=(32, 16), sa_radii=(0.25, 0.5), sa_nsamples=(8, 8),
    sa_mlps=((16, 16), (16, 32)), global_mlp=(32, 64),
    fp_mlps=((32,), (32,), (16, 16)), head_width=16,
)


def _stub_fits(pred, P, key, cfg):
    """fit_frame_batch stand-in for forward-path tests: skips the
    RANSAC/LM compile (the expensive ~60s program) but satisfies the
    PoseResult contract."""
    import jax.numpy as jnp
    B = P.shape[0]
    K = cfg.n_parts
    eye = jnp.broadcast_to(jnp.eye(3), (B, K, 3, 3))
    return {"baseline_R": eye, "baseline_s": jnp.ones((B, K)),
            "baseline_t": jnp.zeros((B, K, 3)),
            "part_counts": jnp.ones((B, K), jnp.int32)}


class TestServing:
    def test_predict_forward_from_checkpoint(self, tmp_path, monkeypatch):
        """Fast default tier: checkpoint restore + forward through
        PosePredictor with the pose stage stubbed out (the full
        RANSAC+LM e2e lives in test_predict_from_checkpoint, slow)."""
        import articulated_pose_tpu.serving as serving_mod

        cfg = NetworkConfig(n_max_parts=3, num_points=128, batch_size=2,
                            ransac_niter_part=8, ransac_niter_joint=4)
        tiny_build = lambda c: ANCSHModel(  # noqa: E731
            n_max_parts=c.n_max_parts, mixed=c.is_mixed,
            pred_joint=c.pred_joint, backbone_spec=TINY)
        monkeypatch.setattr(serving_mod, "build_model", tiny_build)
        monkeypatch.setattr(serving_mod, "fit_frame_batch", _stub_fits)
        model = tiny_build(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, 128, 3), np.float32))
        ck = Checkpointer(str(tmp_path / "model"))
        ck.save(3, state)

        pred = PosePredictor(cfg, work_dir=str(tmp_path),
                             use_nonlinear=False)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        batch, _ = gen.batch(np.random.RandomState(0), 2, num_points=128)
        out = pred(batch["P"])
        assert out.segmentation.shape == (2, 128)
        assert np.isfinite(out.raw["nocs_per_point"]).all()

    @pytest.mark.slow
    def test_predict_from_checkpoint(self, tmp_path, monkeypatch):
        cfg = NetworkConfig(n_max_parts=3, num_points=128, batch_size=2,
                            ransac_niter_part=64, ransac_niter_joint=16)
        # build + checkpoint a tiny model under the serving layout
        import articulated_pose_tpu.serving as serving_mod

        tiny_build = lambda c: ANCSHModel(  # noqa: E731
            n_max_parts=c.n_max_parts, mixed=c.is_mixed,
            pred_joint=c.pred_joint, backbone_spec=TINY)
        monkeypatch.setattr(serving_mod, "build_model", tiny_build)
        model = tiny_build(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, 128, 3), np.float32))
        ck = Checkpointer(str(tmp_path / "model"))
        ck.save(3, state)

        pred = PosePredictor(cfg, work_dir=str(tmp_path))
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        batch, _ = gen.batch(np.random.RandomState(0), 2, num_points=128)
        out = pred(batch["P"])
        assert out.R.shape == (2, 3, 3, 3)
        assert out.scale.shape == (2, 3)
        assert out.segmentation.shape == (2, 128)
        assert np.isfinite(out.R).all()
        # rotations are orthonormal
        RRt = out.R.reshape(-1, 3, 3) @ np.transpose(
            out.R.reshape(-1, 3, 3), (0, 2, 1))
        np.testing.assert_allclose(RRt, np.broadcast_to(np.eye(3), RRt.shape),
                                   atol=1e-3)

    def test_sharded_forward_matches_unsharded(self, monkeypatch):
        """Fast default tier of the SPMD serving guard: forward-only
        (pose stage stubbed) sharded-vs-plain equality over the
        data=4,model=2 mesh.  Catches GSPMD/shard_map repartition
        regressions around the pallas_call without the ~2 min pose
        compile (full version below, slow)."""
        from articulated_pose_tpu.parallel.mesh import make_mesh
        import articulated_pose_tpu.serving as serving_mod

        cfg = NetworkConfig(n_max_parts=3, num_points=128, batch_size=8,
                            ransac_niter_part=8, ransac_niter_joint=4)
        tiny_build = lambda c: ANCSHModel(  # noqa: E731
            n_max_parts=c.n_max_parts, mixed=c.is_mixed,
            pred_joint=c.pred_joint, backbone_spec=TINY)
        monkeypatch.setattr(serving_mod, "build_model", tiny_build)
        monkeypatch.setattr(serving_mod, "fit_frame_batch", _stub_fits)
        model = tiny_build(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, 128, 3), np.float32))
        kw = dict(params=state.params, batch_stats=state.batch_stats,
                  use_nonlinear=False)

        mesh = make_mesh("data=4,model=2")
        sharded = PosePredictor(cfg, mesh=mesh, **kw)
        plain = PosePredictor(cfg, **kw)
        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        batch, _ = gen.batch(np.random.RandomState(0), 8, num_points=128)
        a = sharded(batch["P"])
        b = plain(batch["P"])
        np.testing.assert_allclose(a.raw["nocs_per_point"],
                                   b.raw["nocs_per_point"], atol=1e-5)
        np.testing.assert_array_equal(a.segmentation, b.segmentation)

    @pytest.mark.slow
    def test_sharded_serving_matches_unsharded(self, monkeypatch):
        """SPMD serving over a data=4,model=2 mesh: the batch really
        shards, the (deterministic) forward matches the single-device
        predictor exactly, and the pose fits are valid rotations."""
        from articulated_pose_tpu.parallel.mesh import make_mesh
        import articulated_pose_tpu.serving as serving_mod

        cfg = NetworkConfig(n_max_parts=3, num_points=128, batch_size=8,
                            ransac_niter_part=64, ransac_niter_joint=16)
        tiny_build = lambda c: ANCSHModel(  # noqa: E731
            n_max_parts=c.n_max_parts, mixed=c.is_mixed,
            pred_joint=c.pred_joint, backbone_spec=TINY)
        monkeypatch.setattr(serving_mod, "build_model", tiny_build)
        model = tiny_build(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, 128, 3), np.float32))
        kw = dict(params=state.params, batch_stats=state.batch_stats)

        mesh = make_mesh("data=4,model=2")
        sharded = PosePredictor(cfg, mesh=mesh, **kw)
        plain = PosePredictor(cfg, **kw)

        gen = SyntheticArticulated(n_parts=3, points_per_part=100, seed=0)
        batch, _ = gen.batch(np.random.RandomState(0), 8, num_points=128)
        a = sharded(batch["P"])
        b = plain(batch["P"])
        # each device holds B/data = 2 frames
        P_dev = jax.device_put(
            np.asarray(batch["P"], np.float32), sharded._batch_sharding)
        assert P_dev.sharding.shard_shape(P_dev.shape)[0] == 2
        # forward is deterministic -> exact parity with the unsharded run
        np.testing.assert_allclose(a.raw["nocs_per_point"],
                                   b.raw["nocs_per_point"], atol=1e-5)
        np.testing.assert_array_equal(a.segmentation, b.segmentation)
        # pose fits use per-shard RNG streams; assert validity, not equality
        assert np.isfinite(a.R).all() and a.R.shape == (8, 3, 3, 3)
        RRt = a.R.reshape(-1, 3, 3) @ np.transpose(
            a.R.reshape(-1, 3, 3), (0, 2, 1))
        np.testing.assert_allclose(RRt, np.broadcast_to(np.eye(3), RRt.shape),
                                   atol=1e-3)
        # indivisible batch fails loudly, not with a GSPMD trace error
        with pytest.raises(ValueError, match="data axis"):
            sharded(batch["P"][:6])

    def test_missing_checkpoint_raises(self, tmp_path):
        cfg = NetworkConfig(n_max_parts=2)
        with pytest.raises(FileNotFoundError, match="no checkpoint"):
            PosePredictor(cfg, work_dir=str(tmp_path / "nothing"))
