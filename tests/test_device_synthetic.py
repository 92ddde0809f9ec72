"""On-device synthetic generator: invariants + GT pose consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulated_pose_tpu.data.device_synthetic import DeviceSynthetic
from articulated_pose_tpu.data.synthetic import SyntheticArticulated


@pytest.fixture(scope="module")
def dev_gen():
    gen = SyntheticArticulated(n_parts=3, points_per_part=200, seed=0,
                               full_rotation=False)
    return gen, DeviceSynthetic(gen, num_points=256, noise=0.0)


class TestDeviceSynthetic:
    def test_batch_shapes(self, dev_gen):
        gen, dg = dev_gen
        batch, gt = jax.jit(lambda k: dg.sample_batch(k, 4))(jax.random.PRNGKey(0))
        assert batch["P"].shape == (4, 256, 3)
        assert batch["nocs_gt"].shape == (4, 256, 3)
        assert batch["mask_array"].shape == (4, 256, 3)
        assert gt["R"].shape == (4, 3, 3, 3)
        assert np.isfinite(np.asarray(batch["P"])).all()

    def test_gt_pose_invariant(self, dev_gen):
        """P == s_j R_j nocs_j + t_j for every part, noiselessly."""
        gen, dg = dev_gen
        batch, gt = dg.sample_batch(jax.random.PRNGKey(1), 3)
        batch = jax.device_get(batch)
        gt = jax.device_get(gt)
        for i in range(3):
            cls = batch["cls_gt"][i].astype(int)
            for j in range(3):
                sel = cls == j
                assert sel.sum() > 5
                fitted = (gt["s"][i, j] * batch["nocs_gt"][i][sel]
                          @ gt["R"][i, j].T + gt["t"][i, j])
                np.testing.assert_allclose(fitted, batch["P"][i][sel],
                                           atol=2e-4)

    def test_label_ranges_match_host_generator(self, dev_gen):
        gen, dg = dev_gen
        batch, _ = jax.device_get(dg.sample_batch(jax.random.PRNGKey(2), 2))
        hm = batch["heatmap_gt"]
        assert ((hm >= 0) & (hm <= 1)).all()
        assoc = batch["joint_cls_mask"] > 0
        assert assoc.sum() > 0
        norms = np.linalg.norm(batch["unitvec_gt"][assoc], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        np.testing.assert_array_equal(
            np.argmax(batch["mask_array"], -1), batch["cls_gt"].astype(int))
        # static joint params equal the host generator's
        host_sample, _ = gen.frame(np.random.RandomState(0), num_points=256)
        np.testing.assert_allclose(batch["joint_params_gt"][0],
                                   host_sample["joint_params_gt"], atol=1e-5)

    def test_rotations_are_orthonormal(self, dev_gen):
        gen, dg = dev_gen
        _, gt = jax.device_get(dg.sample_batch(jax.random.PRNGKey(3), 2))
        R = gt["R"].reshape(-1, 3, 3)
        np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_fused_train_step(self, dev_gen):
        # slow tier: a second full train-step compile (~50s on a 1-core
        # host) whose unique coverage is the gen+step scan fusion — the
        # step itself is covered fast by TestTrainStep, the generator by
        # the other tests in this class, and the fused program runs on
        # every driver dryrun and e2e sweep
        from articulated_pose_tpu.config import NetworkConfig
        from articulated_pose_tpu.data.device_synthetic import (
            make_fused_synthetic_train_step)
        from articulated_pose_tpu.models.ancsh import ANCSHModel
        from articulated_pose_tpu.models.pointnet2 import BackboneSpec
        from articulated_pose_tpu.train.state import create_train_state

        gen, dg = dev_gen
        cfg = NetworkConfig(n_max_parts=3, num_points=256, batch_size=2,
                            decay_step=10**9, bn_decay_step=10**9)
        tiny = BackboneSpec(sa_npoints=(32, 16), sa_radii=(0.25, 0.5),
                            sa_nsamples=(8, 8), sa_mlps=((16,), (16,)),
                            global_mlp=(32,), fp_mlps=((16,), (16,), (16,)),
                            head_width=16)
        model = ANCSHModel(n_max_parts=3, mixed=True, pred_joint=True,
                           backbone_spec=tiny)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   np.zeros((1, 256, 3), np.float32))
        step = make_fused_synthetic_train_step(cfg, dg, 2)
        s1, m1 = step(state, jax.random.PRNGKey(1))
        s2, m2 = step(s1, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["total_loss"]))
        assert int(s2.step) == 2
