"""BMVC15-style real-depth data path (reference: lib/dataset.py:321,348
BMVC15 branches; lib/prediction_io.py:97-129 real-data extras)."""

import numpy as np
import pytest

from articulated_pose_tpu.data.real import (build_real_sample,
                                            denormalize_pose,
                                            normalize_cloud)
from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.utils import transforms as tr


class TestNormalization:
    def test_round_trip(self, rng):
        P = rng.rand(200, 3) * 4 - 2
        Pn, c, s = normalize_cloud(P)
        np.testing.assert_allclose(Pn * s + c, P, atol=1e-9)
        assert np.linalg.norm(Pn.max(0) - Pn.min(0)) == pytest.approx(1.0)

    def test_denormalize_pose_consistency(self, rng):
        """A pose fitted in the normalized frame, denormalized, must equal
        the pose fitted on raw metric points."""
        import jax.numpy as jnp

        from articulated_pose_tpu.pose.umeyama import umeyama_similarity

        nocs = rng.rand(100, 3)
        R_true = tr.random_rotation(rng)
        P = 2.5 * nocs @ R_true.T + np.array([0.3, -4.0, 1.0])
        Pn, c, s = normalize_cloud(P)
        Rn, sn, tn = umeyama_similarity(jnp.asarray(nocs), jnp.asarray(Pn))
        R_, s_, t_ = denormalize_pose(np.asarray(Rn), float(sn),
                                      np.asarray(tn), c, s)
        Rm, sm, tm = umeyama_similarity(jnp.asarray(nocs), jnp.asarray(P))
        np.testing.assert_allclose(R_, np.asarray(Rm), atol=1e-5)
        np.testing.assert_allclose(s_, float(sm), rtol=1e-5)
        np.testing.assert_allclose(t_, np.asarray(tm), atol=1e-4)


class TestBuildRealSample:
    def test_fields_and_tiling(self, rng):
        P = rng.rand(80, 3)
        cls = rng.randint(0, 2, 80)
        s = build_real_sample(P, cls, num_points=256, n_max_parts=2, rng=rng)
        assert s["P"].shape == (256, 3)
        assert s["mask_array"].shape == (256, 2)
        assert s["sample_index"].shape == (256,)
        # per-sample normalization invariant
        np.testing.assert_allclose(s["P"].mean(0), 0.0, atol=1e-5)


class TestBMVC15Dataset:
    @pytest.fixture
    def root(self, tmp_path):
        gen = SyntheticArticulated(n_parts=2, points_per_part=150, seed=0,
                                   joint_types=["revolute"])
        gen.export_hdf5(str(tmp_path), "Laptop", frames_per_instance=4,
                        test_fraction=0.5, instance_names=("0001", "0006"))
        return str(tmp_path)

    def test_loader_metric_normalization(self, root):
        from articulated_pose_tpu.data.hdf5_dataset import HDF5Dataset

        ds = HDF5Dataset(root, "Laptop", mode="test", domain="unseen",
                         num_points=128, batch_size=2, nocs_type="AC",
                         fixed_order=True)
        assert ds.metric_input
        assert len(ds) > 0
        batch = next(iter(ds.iterator(shuffle=False, drop_last=False)))
        assert "P_center" in batch and "P_scale" in batch
        # normalized: centroid 0, bbox diagonal 1
        for i in range(batch["P"].shape[0]):
            P = batch["P"][i]
            np.testing.assert_allclose(P.mean(0), 0.0, atol=1e-5)
            assert np.linalg.norm(P.max(0) - P.min(0)) == pytest.approx(
                1.0, abs=1e-4)

    def test_denormalized_gt_pose_maps_to_metric(self, root):
        """GT NOCS fitted in the normalized frame, denormalized with
        (P_center, P_scale), must map NOCS onto the metric cloud."""
        import jax.numpy as jnp

        from articulated_pose_tpu.data.hdf5_dataset import HDF5Dataset
        from articulated_pose_tpu.pose.umeyama import umeyama_similarity

        ds = HDF5Dataset(root, "Laptop", mode="test", domain="unseen",
                         num_points=128, batch_size=2, nocs_type="AC",
                         fixed_order=True)
        batch = next(iter(ds.iterator(shuffle=False, drop_last=False)))
        i = 0
        cls = batch["cls_gt"][i].astype(int)
        sel = cls == 0
        Rn, sn, tn = umeyama_similarity(jnp.asarray(batch["nocs_gt"][i][sel]),
                                        jnp.asarray(batch["P"][i][sel]))
        R, s, t = denormalize_pose(np.asarray(Rn), float(sn), np.asarray(tn),
                                   batch["P_center"][i],
                                   float(batch["P_scale"][i]))
        P_metric = (batch["P"][i] * batch["P_scale"][i]
                    + batch["P_center"][i])
        fitted = s * batch["nocs_gt"][i][sel] @ R.T + t
        np.testing.assert_allclose(fitted, P_metric[sel], atol=1e-3)
