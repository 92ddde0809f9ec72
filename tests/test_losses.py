"""Loss-function tests with hand-computed golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from articulated_pose_tpu import losses
from articulated_pose_tpu.config import NetworkConfig


class TestMiou:
    def test_perfect_prediction(self):
        I_gt = jnp.asarray([[0, 1, 1, 0]])
        W = jnp.asarray(np.eye(2, dtype=np.float32)[np.asarray(I_gt)[0]])[None]
        loss = losses.compute_miou_loss(W, I_gt)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)

    def test_uniform_prediction(self):
        # W = 0.5 everywhere, 2 classes, balanced GT: IoU = (N/2*0.5)/(N/2 + N*0.5 - N/2*0.5)
        I_gt = jnp.asarray([[0, 1, 0, 1]])
        W = jnp.full((1, 4, 2), 0.5)
        loss = np.asarray(losses.compute_miou_loss(W, I_gt))
        # dot = 1.0 per class; denom = 2 + 2 - 1 = 3 -> miou 1/3
        np.testing.assert_allclose(loss, 1 - 1 / 3, rtol=1e-5)

    def test_ignore_label(self):
        I_gt = jnp.asarray([[-1, -1]])
        W = jnp.full((1, 2, 2), 0.5)
        loss = np.asarray(losses.compute_miou_loss(W, I_gt))
        # gt one-hot rows are all-zero: dot=0, denom=sum(W)=1 -> loss=1
        np.testing.assert_allclose(loss, 1.0, rtol=1e-5)


class TestNocsLoss:
    def test_masked_l2(self):
        B, N, K = 1, 4, 2
        gt = jnp.zeros((B, N, 3))
        nocs = jnp.concatenate([jnp.ones((B, N, 3)), jnp.zeros((B, N, 3))], -1)
        mask = jnp.stack([jnp.asarray([1.0, 1, 0, 0]), jnp.asarray([0.0, 0, 1, 1])], -1)[None]
        loss = np.asarray(losses.compute_nocs_loss(
            nocs, gt, num_parts=K, mask_array=mask, type_l="L2"))
        # part 0: mean over N of mask*|1,1,1| = 2*sqrt(3)/4; part 1: 0
        np.testing.assert_allclose(loss, 2 * np.sqrt(3) / 4, rtol=1e-5)

    def test_soft_l1_below_threshold(self):
        d = jnp.asarray([0.05])
        np.testing.assert_allclose(
            np.asarray(losses.smooth_l1_diff(d)), 0.05**2 / 0.2, rtol=1e-5)
        d = jnp.asarray([0.5])
        np.testing.assert_allclose(
            np.asarray(losses.smooth_l1_diff(d)), 0.5 - 0.05, rtol=1e-5)


class TestVectLoss:
    def test_scalar_head_masked(self):
        pred = jnp.asarray([[0.0, 1.0, 1.0]])[..., None]   # (1,3,1) heatmap
        gt = jnp.asarray([[0.0, 0.0, 1.0]])
        mask = jnp.asarray([[1.0, 0.0, 1.0]])
        loss = np.asarray(losses.compute_vect_loss(pred, gt, confidence=mask))
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)
        loss2 = np.asarray(losses.compute_vect_loss(
            pred, gt, confidence=jnp.ones_like(mask)))
        np.testing.assert_allclose(loss2, 1 / 3, rtol=1e-5)

    def test_vector_head(self):
        pred = jnp.zeros((1, 2, 3))
        gt = jnp.ones((1, 2, 3))
        loss = np.asarray(losses.compute_vect_loss(pred, gt))
        np.testing.assert_allclose(loss, np.sqrt(3), rtol=1e-5)


class TestCollect:
    def test_weighted_total_ancsh(self):
        cfg = NetworkConfig()
        B = 2
        ld = {
            "nocs_loss": jnp.full((B,), 1.0),
            "miou_loss": jnp.full((B, 3), 0.5),
            "gocs_loss": jnp.full((B,), 2.0),
            "heatmap_loss": jnp.full((B,), 0.1),
            "unitvec_loss": jnp.full((B,), 0.2),
            "orient_loss": jnp.full((B,), 0.3),
            "index_loss": jnp.full((B, 3), 0.4),
        }
        total, summaries = losses.collect_losses(ld, cfg)
        want = 10 * 1.0 + 1.0 * 0.5 + 1.0 * 2.0 + 5 * 0.1 + 5 * 0.2 + 0.2 * 0.3 + 1.0 * 0.4
        np.testing.assert_allclose(float(total), want, rtol=1e-5)
        assert "total_loss" in summaries

    def test_npcs_mode_skips_joint_terms(self):
        cfg = NetworkConfig(nocs_type="npcs", pred_joint=False, pred_joint_ind=False)
        ld = {"nocs_loss": jnp.ones((1,)), "miou_loss": jnp.ones((1, 3))}
        total, _ = losses.collect_losses(ld, cfg)
        np.testing.assert_allclose(float(total), 11.0, rtol=1e-6)


class TestHungarian:
    def test_matches_identity(self):
        cost = np.asarray([[[0.0, 1.0], [1.0, 0.0]]])
        m = losses.hungarian_matching(cost, np.asarray([2]))
        np.testing.assert_array_equal(m[0, :2], [0, 1])


class TestConfig:
    def test_load_yaml_config(self):
        import os

        from articulated_pose_tpu.config import load_config

        cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                       "cfg", "network_config.yml"))
        assert cfg.nocs_loss_multiplier == 10.0
        assert cfg.batch_size == 16
        assert cfg.is_mixed
        assert cfg.compute_dtype == "bfloat16"

    def test_unknown_key_rejected(self):
        from articulated_pose_tpu.config import load_config

        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(None, bogus_key=1)

    def test_npcs_preset_disables_joint_heads(self):
        from articulated_pose_tpu.config import load_config

        cfg = load_config(None, nocs_type="npcs", pred_joint=True)
        assert not cfg.pred_joint and not cfg.pred_joint_ind

    def test_schedules(self):
        import numpy as np

        from articulated_pose_tpu.config import bn_momentum_schedule, lr_schedule

        # staircase: lr drops by decay_rate every decay_step samples
        lr0 = float(lr_schedule(0, 16, 1e-3, 200_000, 0.7))
        lr1 = float(lr_schedule(200_000 // 16, 16, 1e-3, 200_000, 0.7))
        np.testing.assert_allclose(lr0, 1e-3)
        np.testing.assert_allclose(lr1, 7e-4, rtol=1e-6)
        # bn momentum: min(0.99, 1 - 0.5*0.5^k), starts at 0.5
        np.testing.assert_allclose(float(bn_momentum_schedule(0, 16, 200_000)), 0.5)
        big = float(bn_momentum_schedule(10**7, 16, 200_000))
        np.testing.assert_allclose(big, 0.99)
