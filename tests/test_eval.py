"""Evaluation suite tests, incl. the reference's iou_3d sanity cases."""

import numpy as np

from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.eval import metrics as M
from articulated_pose_tpu.eval import pipeline as E
from articulated_pose_tpu.utils import transforms as tr


class TestIoU:
    """Mirrors the reference self-test (lib/d3_utils.py:331-346)."""

    def test_identity(self):
        b = M.get_3d_bbox([2.0, 2.0, 2.0])
        assert M.box_iou_3d(b, b) == 1.0

    def test_shifted(self):
        b1 = M.get_3d_bbox([2.0, 2.0, 2.0])
        b2 = b1 + np.array([1.0, 0, 0])
        iou = M.box_iou_3d(b1, b2)
        # overlap 1x2x2 = 4, union 12 -> 1/3
        np.testing.assert_allclose(iou, 1 / 3, atol=0.02)

    def test_disjoint(self):
        b1 = M.get_3d_bbox([2.0, 2.0, 2.0])
        b2 = b1 + np.array([2.0, 0, 0])
        assert M.box_iou_3d(b1, b2) < 0.02

    def test_rotated_45(self):
        b1 = M.get_3d_bbox([2.0, 2.0, 2.0])
        R = tr.axis_angle_matrix(np.array([0, 0, 1.0]), np.pi / 4)
        b2 = b1 @ R.T
        iou = M.box_iou_3d(b1, b2)
        assert 0.6 < iou < 0.8  # known ~0.707 overlap band

    def test_pts_inside_box(self):
        b = M.get_3d_bbox([2.0, 2.0, 2.0])
        pts = np.array([[0.0, 0, 0], [0.9, 0.9, 0.9], [1.1, 0, 0]])
        np.testing.assert_array_equal(M.pts_inside_box(pts, b), [True, True, False])


class TestMetrics:
    def test_pose_errors_zero(self, rng):
        R = tr.random_rotation(rng)
        e = M.pose_errors(R, np.zeros(3), 1.0, R, np.zeros(3), 1.0)
        assert e["rot_err_deg"] < 1e-4
        assert e["trans_err"] == 0 and e["scale_err"] == 0

    def test_accuracy(self):
        rot = np.array([1.0, 4.9, 6.0, np.nan])
        trans = np.array([0.01, 0.2, 0.01, 0.0])
        acc = M.accuracy_5deg5cm(rot, trans)
        assert acc["n_valid"] == 3
        np.testing.assert_allclose(acc["acc_5deg"], 2 / 3)
        np.testing.assert_allclose(acc["acc_5deg5cm"], 1 / 3)

    def test_bbox_from_nocs_extent(self):
        nocs = np.array([[0.2, 0.5, 0.5], [0.8, 0.6, 0.5]])
        box = M.bbox_from_nocs_extent(nocs)
        # size = 2*max|nocs-0.5| = (0.6, 0.2, 0.0), centered at 0.5
        np.testing.assert_allclose(box[:, 0].max(), 0.8, atol=1e-9)
        np.testing.assert_allclose(box[:, 0].min(), 0.2, atol=1e-9)


class TestGTandEval:
    def test_compute_gt_poses_recovers_synthetic(self):
        gen = SyntheticArticulated(n_parts=2, points_per_part=200, seed=9)
        sample, gt = gen.frame(np.random.RandomState(2), num_points=400)
        cls = sample["cls_gt"].astype(int)
        fits = E.compute_gt_poses(sample["nocs_gt"], sample["P"], cls, 2)
        for j in range(2):
            s_gt, R_gt, t_gt = tr.decompose_similarity(gt.rt_nocs2cam[j])
            assert tr.rot_diff_degree(fits[j]["R"], R_gt) < 0.5
            np.testing.assert_allclose(fits[j]["s"], s_gt, rtol=1e-3)
            np.testing.assert_allclose(fits[j]["t"], t_gt, atol=1e-3)

    def test_evaluate_fits_report(self):
        gen = SyntheticArticulated(n_parts=2, points_per_part=150, seed=9)
        rng = np.random.RandomState(4)
        fits, gts, nocs_pred, nocs_gt, cls_list = [], [], [], [], []
        for i in range(3):
            sample, gt = gen.frame(rng, num_points=256)
            cls = sample["cls_gt"].astype(int)
            g = {"R": [], "s": [], "t": []}
            for j in range(2):
                s_, R_, t_ = tr.decompose_similarity(gt.rt_nocs2cam[j])
                g["R"].append(R_)
                g["s"].append(s_)
                g["t"].append(t_)
            gts.append(g)
            fits.append(g)  # perfect predictions
            N = 256
            npred = np.zeros((N, 6), np.float32)
            for j in range(2):
                npred[cls == j, 3 * j:3 * (j + 1)] = sample["nocs_gt"][cls == j]
            nocs_pred.append(npred)
            nocs_gt.append(sample["nocs_gt"])
            cls_list.append(cls)
        report = E.evaluate_fits(fits, gts, 2, nocs_pred=nocs_pred,
                                 nocs_gt=nocs_gt, cls_list=cls_list,
                                 miou_nres=30)
        assert report.overall["rot_err_deg_mean"] < 1e-3
        assert report.overall["acc_5deg5cm"] == 1.0
        assert report.per_part[0]["miou_mean"] > 0.95
        assert report.n_dropped == 0
        assert "part 0" in report.summary()

    def test_segmentation_iou_and_hungarian(self):
        rng = np.random.RandomState(0)
        cls = rng.randint(0, 3, size=400)
        W = np.eye(3, dtype=np.float32)[cls]
        assert E.segmentation_iou(W, cls, 3) == 1.0
        # permute prediction channels: fixed metric collapses, the
        # hungarian-matched one recovers (lib/loss.py:14-21 consumed)
        perm = [2, 0, 1]
        Wp = W[:, perm]
        assert E.segmentation_iou(Wp, cls, 3) < 0.1
        assert E.segmentation_iou(Wp, cls, 3, hungarian=True) == 1.0

    def test_get_test_group_subsampling(self):
        from articulated_pose_tpu.data.hdf5_dataset import get_test_group
        from articulated_pose_tpu.registry import get_category

        spec = get_category("eyeglasses")  # test_list 0007/0016/0036
        files = [f"hdf5/eyeglasses/{ins}/{art}/{fr}.h5"
                 for ins in ("0007", "0042", "0006")
                 for art in range(4) for fr in range(12)]
        unseen = get_test_group(files, spec, "unseen")
        # unseen keeps frames 0,5,10 of held-out instances (data_utils:913)
        assert unseen and all("/0007/" in f for f in unseen)
        assert {f.split("/")[-1] for f in unseen} == {"0.h5", "5.h5", "10.h5"}
        seen = get_test_group(files, spec, "seen")
        # seen keeps every 3rd articulation, and spec_list 0006 is skipped
        assert seen and all("/0042/" in f for f in seen)
        assert {f.split("/")[-2] for f in seen} == {"0", "3"}
        full = get_test_group(files, spec, "unseen", full=True)
        assert len(full) == 4 * 12

    def test_gt_joint_lines_match_renderer_gt(self):
        """Label-voted GT joint lines (eval_joint_params.py:193-207,
        234-241) must agree with the renderer's exact camera-frame GT."""
        gen = SyntheticArticulated(n_parts=2, points_per_part=300, seed=12)
        sample, gt = gen.frame(np.random.RandomState(8), num_points=600)
        lines = E.gt_joint_lines(sample, sample["P"], 2)
        assert lines[0] is not None
        errs = E.joint_errors(lines[0], gt.joint_axes_cam[0],
                              gt.joint_points_cam[0])
        assert errs["axis_err_deg"] < 2.0
        assert errs["line_dist"] < 0.05

    def test_pred_joint_lines_from_perfect_predictions(self):
        """Feeding GT labels through the *prediction* protocol (global→part
        st recovery + part-0 pose, eval_joint_params.py:160-229) must
        recover the joint line too."""
        gen = SyntheticArticulated(n_parts=2, points_per_part=300, seed=3)
        sample, gt = gen.frame(np.random.RandomState(5), num_points=600)
        cls = sample["cls_gt"].astype(int)
        N, K = sample["P"].shape[0], 2
        # build a "perfect prediction" dict from the GT labels
        W = np.eye(K, dtype=np.float32)[cls]
        nocs = np.zeros((N, 3 * K), np.float32)
        for j in range(K):
            nocs[cls == j, 3 * j:3 * (j + 1)] = sample["nocs_gt"][cls == j]
        pred = {
            "W": W,
            "nocs_per_point": nocs,
            "gocs_per_point": sample["nocs_gt_g"],
            "heatmap_per_point": sample["heatmap_gt"].reshape(-1, 1),
            "unitvec_per_point": sample["unitvec_gt"],
            "joint_axis_per_point": sample["orient_gt"],
            "index_per_point": np.eye(K, dtype=np.float32)[
                sample["joint_cls_gt"].astype(int)],
        }
        base = E.compute_gt_poses(sample["nocs_gt"], sample["P"], cls, 1)[0]
        lines = E.pred_joint_lines(pred, base, K)
        assert lines[0] is not None
        errs = E.joint_errors(lines[0], gt.joint_axes_cam[0],
                              gt.joint_points_cam[0])
        assert errs["axis_err_deg"] < 2.0
        assert errs["line_dist"] < 0.06


class TestRelativePoseErrors:
    """relative_pose_errors — the reference's inter-part 'joint state'
    metrics (evaluation/eval_pose_err.py:307-335)."""

    def _poses(self, Rs, ss, ts):
        return {"R": list(Rs), "s": list(ss), "t": list(ts)}

    def test_revolute_exact_and_perturbed(self):
        rng = np.random.RandomState(3)
        R0 = tr.random_rotation(rng)
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        R1 = R0 @ tr.axis_angle_matrix(axis, 0.9)
        gt = self._poses([R0, R1], [1.0, 1.0], [np.zeros(3)] * 2)
        # exact fit -> zero relative rotation error
        rel = E.relative_pose_errors(gt, gt, gt, 2)
        assert abs(rel[0]["rel_rot_err_deg"]) < 1e-4
        # perturb the moving part by a known extra angle: the relative
        # rotation error must read exactly that angle
        delta = 12.5
        pert = rng.randn(3)
        pert /= np.linalg.norm(pert)
        R1p = R1 @ tr.axis_angle_matrix(pert, np.deg2rad(delta))
        fit = self._poses([R0, R1p], [1.0, 1.0], [np.zeros(3)] * 2)
        rel = E.relative_pose_errors(fit, gt, gt, 2)
        np.testing.assert_allclose(rel[0]["rel_rot_err_deg"], delta,
                                   atol=1e-3)

    def test_prismatic_boundary_roundtrip(self):
        """Drawer scene where part NOCS == global NOCS: the boundary
        trick recovers the exact camera-space slide, so perfect
        predictions give zero relative translation error."""
        rng = np.random.RandomState(5)
        delta = 0.17
        # base occupies [0.3,0.7]^3 of the global frame, drawer (closed)
        # [0.1,0.3]x[0.4,0.6]^2; global->camera identity; drawer slides
        # by -delta along canonical x
        base = rng.rand(200, 3) * 0.4 + 0.3
        drawer_canon = rng.rand(150, 3) * np.array([0.2, 0.2, 0.2]) \
            + np.array([0.1, 0.4, 0.4])
        # make sure the bbox is tight so scale_pred is exact
        drawer_canon[0] = [0.1, 0.4, 0.4]
        drawer_canon[1] = [0.3, 0.6, 0.6]
        P = np.concatenate([base, drawer_canon - [delta, 0, 0]])
        cls = np.concatenate([np.zeros(200, int), np.ones(150, int)])
        nocs = np.concatenate([base, drawer_canon])   # part NOCS == NAOCS
        eye = np.eye(3)
        fit = self._poses([eye, eye], [1.0, 1.0],
                          [np.zeros(3), np.array([-delta, 0.0, 0.0])])
        gt_part = fit
        gt_global = self._poses([eye, eye], [1.0, 1.0],
                                [np.zeros(3), np.array([-delta, 0.0, 0.0])])
        rel = E.relative_pose_errors(fit, gt_part, gt_global, 2,
                                     nocs_pred=nocs, P=P, cls_pred=cls)
        assert rel[0]["rel_trans_err"] < 1e-6
        assert abs(rel[0]["rel_rot_err_deg"]) < 1e-4
        # wrong slide amount in the GT -> error reads the difference
        gt_global_wrong = self._poses(
            [eye, eye], [1.0, 1.0],
            [np.zeros(3), np.array([-delta - 0.05, 0.0, 0.0])])
        rel = E.relative_pose_errors(fit, gt_part, gt_global_wrong, 2,
                                     nocs_pred=nocs, P=P, cls_pred=cls)
        np.testing.assert_allclose(rel[0]["rel_trans_err"], 0.05, atol=1e-6)

    def test_naocs_fit_translation_delta(self):
        eye = np.eye(3)
        fit = self._poses([eye, eye], [1.0, 1.0],
                          [np.zeros(3), np.array([0.1, 0.0, 0.0])])
        gt_global = self._poses([eye, eye], [1.0, 1.0],
                                [np.zeros(3), np.array([0.3, 0.0, 0.0])])
        rel = E.relative_pose_errors(fit, fit, gt_global, 2, naocs_fit=True)
        np.testing.assert_allclose(rel[0]["rel_trans_err"], 0.2, atol=1e-7)

    def test_evaluate_fits_aggregates_per_joint(self):
        rng = np.random.RandomState(11)
        K = 3
        frames = []
        for _ in range(4):
            Rs = [tr.random_rotation(rng) for _ in range(K)]
            frames.append(self._poses(Rs, [1.0] * K,
                                      [rng.rand(3) for _ in range(K)]))
        report = E.evaluate_fits(frames, frames, K, gts_global=frames,
                                 naocs_fit=True)
        assert len(report.per_joint) == K - 1
        for stats in report.per_joint:
            assert stats["rel_rot_err_deg_mean"] < 1e-4
            assert stats["rel_trans_err_mean"] < 1e-9
            assert stats["n_rel_rot"] == 4
        assert report.overall["rel_rot_err_deg_mean"] < 1e-4
        assert "joint 1" in report.summary()
