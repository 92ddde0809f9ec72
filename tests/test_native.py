"""C++ native labeling fast path: build, parity vs NumPy, throughput."""

import numpy as np
import pytest

from articulated_pose_tpu import native
from articulated_pose_tpu.data.labeling import build_sample
from articulated_pose_tpu.data.synthetic import SyntheticArticulated
from articulated_pose_tpu.utils import transforms as tr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library failed to build")


def make_frame(joint_types=("revolute", "revolute"), seed=0):
    gen = SyntheticArticulated(n_parts=len(joint_types) + 1,
                               points_per_part=300, joint_types=joint_types,
                               seed=seed)
    rng = np.random.RandomState(seed + 1)
    states = [0.5] * len(joint_types)
    art = gen.articulation_transforms(states)
    cam = tr.similarity(1.1, tr.random_rotation(rng), rng.rand(3))
    parts_pts = [tr.apply_similarity(cam @ art[j], gen.parts_canon[j])
                 for j in range(gen.n_parts)]
    return gen, parts_pts


@pytest.mark.parametrize("joint_types", [
    ("revolute", "revolute"), ("prismatic",),
    ("fixed", "prismatic", "prismatic"),
])
def test_parity_with_numpy(joint_types):
    gen, parts_pts = make_frame(joint_types)
    K = gen.n_parts
    n_total = sum(len(p) for p in parts_pts)
    sel = np.random.RandomState(7).permutation(n_total)[:256].astype(np.int32)

    py = build_sample(parts_pts, gen.parts_canon, gen.joints, gen.norm,
                      num_points=256, n_max_parts=K, rng=None, permute=False)
    # rebuild python with the same explicit selection for exact parity
    import articulated_pose_tpu.data.labeling as L

    class FixedRng:
        def permutation(self, n):
            return np.concatenate([sel, np.setdiff1d(np.arange(n), sel)])

    py = build_sample(parts_pts, gen.parts_canon, gen.joints, gen.norm,
                      num_points=256, n_max_parts=K, rng=FixedRng())
    cc = native.build_labels_native(parts_pts, gen.parts_canon, gen.joints,
                                    gen.norm, num_points=256, n_max_parts=K,
                                    sel=sel)
    for key in ("P", "cls_gt", "mask_array", "nocs_gt", "nocs_gt_g",
                "heatmap_gt", "unitvec_gt", "orient_gt", "joint_cls_gt",
                "joint_cls_mask", "joint_params_gt"):
        np.testing.assert_allclose(cc[key], py[key], atol=2e-5,
                                   err_msg=f"key {key}")


def test_tiled_selection():
    gen, parts_pts = make_frame(("revolute",), seed=3)
    n_total = sum(len(p) for p in parts_pts)
    num_points = n_total * 2 + 10
    sel = np.arange(num_points, dtype=np.int32)  # forces modular tiling
    out = native.build_labels_native(parts_pts, gen.parts_canon, gen.joints,
                                     gen.norm, num_points=num_points,
                                     n_max_parts=2, sel=sel)
    np.testing.assert_allclose(out["P"][:n_total], out["P"][n_total:2 * n_total])


def test_throughput_faster_than_numpy():
    import time

    gen, parts_pts = make_frame(("revolute", "revolute"), seed=5)
    K = gen.n_parts
    n = 30

    t0 = time.perf_counter()
    for i in range(n):
        build_sample(parts_pts, gen.parts_canon, gen.joints, gen.norm,
                     num_points=1024, n_max_parts=K,
                     rng=np.random.RandomState(i))
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n):
        native.build_labels_native(parts_pts, gen.parts_canon, gen.joints,
                                   gen.norm, num_points=1024, n_max_parts=K,
                                   rng=np.random.RandomState(i))
    t_cc = time.perf_counter() - t0
    # the native path must at least keep pace (it is typically ~5-20x faster)
    assert t_cc < t_py, (t_cc, t_py)
