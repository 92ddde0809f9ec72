"""Tests for augmentations, the direct joint-regression baseline, and vis."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulated_pose_tpu.data import augment
from articulated_pose_tpu.models.joint_regression import (
    DirectJointRegression,
    direct_joint_loss,
)
from articulated_pose_tpu.utils import vis


class TestAugment:
    def test_rotation_preserves_norms(self, rng):
        pts = rng.rand(100, 3)
        for fn in (augment.rotate_point_cloud_y, augment.rotate_perturbation):
            out = fn(pts, rng)
            np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                                       np.linalg.norm(pts, axis=1), atol=1e-9)

    def test_jitter_clipped(self, rng):
        pts = np.zeros((50, 3))
        out = augment.jitter_point_cloud(pts, rng, sigma=1.0, clip=0.05)
        assert np.abs(out).max() <= 0.05 + 1e-12

    def test_scale_shift(self, rng):
        pts = rng.rand(20, 3)
        out = augment.random_scale_point_cloud(pts, rng, 0.5, 0.5)
        np.testing.assert_allclose(out, pts * 0.5)
        out = augment.shift_point_cloud(pts, rng, 0.0)
        np.testing.assert_allclose(out, pts)

    def test_dropout_static_shape(self, rng):
        pts = rng.rand(30, 3)
        out = augment.random_point_dropout(pts, rng)
        assert out.shape == pts.shape


class TestDirectJointRegression:
    def test_forward_and_loss(self, rng):
        B, N, K = 2, 128, 3
        P = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        model = DirectJointRegression(n_max_parts=K)
        params = model.init(jax.random.PRNGKey(0), P)
        pred = model.apply(params, P)
        assert len(pred["joint_params"]) == K - 1
        axis, orth, dist = pred["joint_params"][0]
        assert axis.shape == (B, 3) and dist.shape == (B, 1)
        gt = jnp.asarray(rng.rand(B, K, 7), jnp.float32)
        losses = direct_joint_loss(pred, gt)
        assert set(losses) == {"axis_loss", "orth_loss", "dist_loss"}
        assert np.isfinite(np.asarray(losses["axis_loss"])).all()


class TestVis:
    def test_plot3d_and_arrows(self, rng, tmp_path):
        pts = rng.rand(50, 3)
        vis.plot3d_pts([[pts, pts + 1]], [["a", "b"]], title="t",
                       save_path=os.path.join(str(tmp_path), "p.png"))
        vis.plot_arrows(pts, rng.rand(50, 3) * 0.1,
                        joint={"point": [0, 0, 0], "axis": [0, 0, 1]},
                        save_path=os.path.join(str(tmp_path), "a.png"))
        vis.hist_show([rng.rand(100)], ["err"],
                      save_path=os.path.join(str(tmp_path), "h.png"))
        from articulated_pose_tpu.eval.metrics import get_3d_bbox
        vis.plot_bbox(os.path.join(str(tmp_path), "b.png"),
                      get_3d_bbox([1, 1, 1]), pts)
        for f in ("p.png", "a.png", "h.png", "b.png"):
            assert os.path.getsize(os.path.join(str(tmp_path), f)) > 0

    def test_extended_plots(self, rng, tmp_path):
        from articulated_pose_tpu.eval.metrics import get_3d_bbox

        pts = rng.rand(60, 3)
        joint = {"point": [0, 0, 0], "axis": [0, 0, 1]}
        vis.plot_arrows_list([pts, pts + 1], [rng.rand(60, 3)] * 2,
                             joints=[joint, None], titles=["a", "b"],
                             save_path=os.path.join(str(tmp_path), "al.png"))
        vis.plot_joints_bb_list(pts, [get_3d_bbox([1, 1, 1])], [joint],
                                save_path=os.path.join(str(tmp_path), "jb.png"))
        img = rng.rand(32, 32, 3)
        mask = rng.randint(0, 3, (32, 32))
        vis.draw_segmentation_2d(img, mask, 3,
                                 save_path=os.path.join(str(tmp_path), "sg.png"))
        vis.viz_err_distri(rng.rand(200) * 10, title="rot",
                           save_path=os.path.join(str(tmp_path), "ed.png"))
        for f in ("al.png", "jb.png", "sg.png", "ed.png"):
            assert os.path.getsize(os.path.join(str(tmp_path), f)) > 0


class TestNaocs:
    def test_part_scale_translation_exact(self, rng):
        import jax.numpy as jnp
        from articulated_pose_tpu.pose.naocs import part_scale_translation

        nocs = rng.rand(100, 3)
        s_true, t_true = 0.4, np.array([0.1, 0.3, -0.2])
        gocs = s_true * nocs + t_true
        w = np.ones(100); w[50:] = 0
        gocs[50:] += 5.0  # corrupt masked-out rows
        s, t = part_scale_translation(jnp.asarray(nocs), jnp.asarray(gocs),
                                      jnp.asarray(w))
        np.testing.assert_allclose(float(s), s_true, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)

    def test_naocs_pred_view(self, rng):
        import jax.numpy as jnp
        from articulated_pose_tpu.pose.naocs import naocs_pred_view

        pred = {"W": jnp.zeros((4, 3)),
                "gocs_per_point": jnp.asarray(rng.rand(4, 3), jnp.float32)}
        out = naocs_pred_view(pred, 2)
        assert out["nocs_per_point"].shape == (4, 6)
        np.testing.assert_allclose(np.asarray(out["nocs_per_point"][:, :3]),
                                   np.asarray(out["nocs_per_point"][:, 3:]))


class TestPcUtil:
    def test_volume_roundtrip(self, rng):
        from articulated_pose_tpu.utils import pc_util

        pts = rng.rand(200, 3) * 1.6 - 0.8
        vol = pc_util.point_cloud_to_volume(pts, vsize=16)
        assert vol.sum() > 0
        back = pc_util.volume_to_point_cloud(vol)
        # every voxel center is within half a diagonal of some input point
        d = np.min(np.linalg.norm(back[:, None] - pts[None], axis=-1), axis=1)
        assert d.max() < np.sqrt(3) * (2 / 16)

    def test_image_projection(self, rng):
        from articulated_pose_tpu.utils import pc_util

        img = pc_util.point_cloud_to_image(rng.rand(100, 3) - 0.5, imgsize=32)
        assert img.shape == (32, 32) and img.max() == 1.0


class TestStepTimer:
    def test_stages(self):
        from articulated_pose_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(5):
            with t.stage("a"):
                pass
        s = t.summary()
        assert s["a"]["count"] == 5 and s["a"]["mean_ms"] >= 0
