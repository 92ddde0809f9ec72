"""Tools tests: motion JSON → JointSpecs/URDF round-trip, OBJ parsing,
depth back-projection inverse consistency."""

import os

import numpy as np
import pytest

from articulated_pose_tpu.tools import motion_json, preprocess, urdf
from articulated_pose_tpu.utils import transforms as tr

MOTION = {
    "dof_name": "dof_rootd",
    "center": [0, 0, 0],
    "children": [
        {"dof_name": "dof_1", "center": [0.4, 0.0, 0.0],
         "direction": [0, 0, 1], "motion_type": "rotation", "children": None},
        {"dof_name": "dof_2", "center": [-0.4, 0.0, 0.0],
         "direction": [1, 0, 0], "motion_type": "translation", "children": None},
    ],
}


class TestMotionJson:
    def test_parse(self):
        model = motion_json.parse_motion_json(MOTION)
        assert model.n_parts == 3
        assert model.joints[0].jtype == "revolute"
        assert model.joints[1].jtype == "prismatic"
        np.testing.assert_allclose(model.joints[0].position, [0.4, 0, 0])
        np.testing.assert_allclose(model.joints[0].axis, [0, 0, 1])
        assert model.joints[0].parent == 0 and model.joints[0].child == 1

    def test_urdf_roundtrip(self, tmp_path):
        model = motion_json.parse_motion_json(MOTION)
        paths = motion_json.write_urdf(model, str(tmp_path))
        assert os.path.exists(paths[0])
        assert len(paths) == 4  # syn.urdf + 3 per-part
        parsed = urdf.parse_urdf(paths[0])
        assert parsed["num_links"] == 3
        specs = urdf.urdf_to_joint_specs(parsed)
        assert len(specs) == 2
        assert specs[0].jtype == "revolute"
        np.testing.assert_allclose(specs[0].axis, [0, 0, 1])
        # link visual origin = -center, so position = -(-center) = center
        np.testing.assert_allclose(specs[0].position, [0.4, 0, 0])


class TestObjParsing:
    def test_load_vertices(self, tmp_path):
        p = os.path.join(str(tmp_path), "box.obj")
        with open(p, "w") as f:
            f.write("# comment\nv 0 0 0\nv 1 0 0\nv 0 2 0\nf 1 2 3\n")
        v = urdf.load_obj_vertices(p)
        assert v.shape == (3, 3)
        np.testing.assert_allclose(v[2], [0, 2, 0])

    def test_norm_info(self, tmp_path):
        for i, off in enumerate([0.0, 2.0]):
            with open(os.path.join(str(tmp_path), f"p{i}.obj"), "w") as f:
                for corner in [(0, 0, 0), (1, 1, 1)]:
                    c = np.add(corner, off)
                    f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        ni = urdf.norm_info_from_objs(
            [os.path.join(str(tmp_path), "p0.obj"),
             os.path.join(str(tmp_path), "p1.obj")])
        np.testing.assert_allclose(ni.corners[0][1], [3, 3, 3])
        np.testing.assert_allclose(ni.factors[1], 1 / np.sqrt(3), rtol=1e-6)


class TestBackprojection:
    def test_depth_roundtrip(self):
        """Project known camera points with a GL projection matrix, then
        back-project the depth buffer and recover them."""
        H = W = 64
        fov, near, far = 75.0, 0.1, 10.0
        f = 1.0 / np.tan(np.radians(fov) / 2)
        proj = np.array([
            [f, 0, 0, 0],
            [0, f, 0, 0],
            [0, 0, (far + near) / (near - far), 2 * far * near / (near - far)],
            [0, 0, -1, 0],
        ])
        # synthesize a fronto-parallel plane at z = -2 (camera looks -z)
        depth = np.full((H, W), -2.0)
        pts = preprocess.depth_to_camera_points(depth, proj)
        assert pts.shape == (H * W, 3)
        np.testing.assert_allclose(pts[:, 2], -2.0, atol=1e-9)
        # x extent at z=-2: |x| <= 2/f (NDC in [-1, 1])
        assert abs(pts[:, 0]).max() <= 2 / f + 1e-6
        # back-project a masked subset and match the full version
        mask = np.zeros((H, W), bool)
        mask[10:20, 30:40] = True
        sub = preprocess.depth_to_camera_points(depth, proj, mask)
        assert sub.shape == (100, 3)

    def test_world_canonical_inverse(self, rng):
        cloud = rng.rand(50, 3)
        pose = tr.similarity(1.0, tr.random_rotation(rng), rng.rand(3))
        world = preprocess.world_to_canonical(cloud, np.linalg.inv(pose))
        np.testing.assert_allclose(world, tr.apply_similarity(pose, cloud),
                                   atol=1e-9)

    def test_preprocess_frame_skips_small_parts(self):
        H = W = 32
        depth = np.full((H, W), -2.0)
        label = np.zeros((H, W), int)
        label[0, 0] = 1  # part 1 has a single pixel -> skip
        proj = np.eye(4)
        out = preprocess.preprocess_frame(depth, label, proj, np.eye(4),
                                          [np.eye(4)] * 2, 2)
        assert out is None

    def test_write_frame_h5(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        path = os.path.join(str(tmp_path), "sub", "0.h5")
        cam = [np.random.rand(10, 3), np.random.rand(8, 3)]
        preprocess.write_frame_h5(path, cam, cam)
        with h5py.File(path) as f:
            assert f["gt_points"]["0"].shape == (10, 3)
            assert f["gt_coords"]["1"].shape == (8, 3)

    def test_write_splits(self, tmp_path):
        files = [f"hdf5/cat/{i:04d}/0/0.h5" for i in range(4)]
        preprocess.write_splits(str(tmp_path), "cat", files, ["0003"])
        train = open(os.path.join(str(tmp_path), "splits/cat/0.01/train.txt")).read()
        test = open(os.path.join(str(tmp_path), "splits/cat/0.01/test.txt")).read()
        assert "0003" not in train and "0003" in test


class TestRenderGate:
    def test_clear_error_without_pybullet(self):
        from articulated_pose_tpu.tools import render

        if render.HAS_PYBULLET:
            pytest.skip("pybullet present")
        with pytest.raises(ImportError, match="SyntheticArticulated"):
            render.PyBulletRenderer(["x.urdf"])


class TestPlyWriter:
    def test_round_trip(self, tmp_path, rng):
        from articulated_pose_tpu.tools.preprocess import write_pointcloud

        xyz = rng.rand(50, 3).astype(np.float32)
        rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
        path = str(tmp_path / "cloud.ply")
        write_pointcloud(path, xyz, rgb)
        raw = open(path, "rb").read()
        header, blob = raw.split(b"end_header\n", 1)
        assert b"element vertex 50" in header
        rec = np.frombuffer(blob, dtype=[("x", "<f4"), ("y", "<f4"),
                                         ("z", "<f4"), ("r", "u1"),
                                         ("g", "u1"), ("b", "u1")])
        got = np.stack([rec["x"], rec["y"], rec["z"]], 1)
        np.testing.assert_allclose(got, xyz, rtol=1e-6)
        np.testing.assert_array_equal(
            np.stack([rec["r"], rec["g"], rec["b"]], 1), rgb)


class TestGetPose:
    def test_reads_gt_yml(self, tmp_path, rng):
        import yaml

        from articulated_pose_tpu.tools.preprocess import get_pose
        from articulated_pose_tpu.utils import transforms as tr

        R = tr.random_rotation(rng)
        q = tr.quaternion_from_matrix(R)          # wxyz
        orn_xyzw = [float(q[1]), float(q[2]), float(q[3]), float(q[0])]
        pos = [0.1, -0.2, 0.3]
        meta = {"frame_0": {
            "viewMat": np.eye(4).T.reshape(-1).tolist(),
            "projMat": np.eye(4).T.reshape(-1).tolist(),
            "obj": [[0, 0, 0, 0, pos, orn_xyzw]],
        }}
        d = tmp_path / "render" / "oven" / "0001" / "0"
        d.mkdir(parents=True)
        with open(d / "gt.yml", "w") as f:
            yaml.safe_dump(meta, f)
        m2w, view, proj = get_pose(str(tmp_path), "oven", "0001", "0", "0",
                                   num_parts=2)
        np.testing.assert_allclose(m2w[0], np.eye(4), atol=1e-12)
        np.testing.assert_allclose(m2w[1][:3, :3], R, atol=1e-8)
        np.testing.assert_allclose(m2w[1][:3, 3], pos, atol=1e-12)


class TestQuaternions:
    def test_round_trip(self, rng):
        from articulated_pose_tpu.utils import transforms as tr

        for _ in range(20):
            R = tr.random_rotation(rng)
            q = tr.quaternion_from_matrix(R)
            np.testing.assert_allclose(tr.quaternion_matrix(q)[:3, :3], R,
                                       atol=1e-8)


class TestUrdfGen:
    """SAPIEN mobility.urdf cleanup + stick generator (tools/urdf_gen.py)."""

    MOBILITY = """<robot name="drawer">
  <link name="base">
    <visual><geometry><box size="1 1 1"/></geometry></visual>
    <collision><geometry><box size="1 1 1"/></geometry></collision>
  </link>
  <link name="link_0">
    <visual><geometry><box size="0.5 0.4 0.1"/></geometry></visual>
    <collision><geometry><box size="0.5 0.4 0.1"/></geometry></collision>
  </link>
  <link name="link_1">
    <visual><geometry><box size="0.5 0.4 0.1"/></geometry></visual>
    <collision><geometry><box size="0.5 0.4 0.1"/></geometry></collision>
  </link>
  <joint name="j0" type="prismatic">
    <parent link="base"/><child link="link_0"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j1" type="prismatic">
    <parent link="base"/><child link="link_1"/>
    <origin xyz="0 0 0.3" rpy="0 0 0"/><axis xyz="0 1 0"/>
  </joint>
</robot>"""

    def test_modify_urdf_roundtrip(self, tmp_path):
        import xml.etree.ElementTree as ET

        from articulated_pose_tpu.tools.urdf_gen import modify_urdf

        d = str(tmp_path)
        with open(os.path.join(d, "mobility.urdf"), "w") as f:
            f.write(self.MOBILITY)
        paths = modify_urdf(d)
        assert [os.path.basename(p) for p in paths] == [
            "syn_p0.urdf", "syn_p1.urdf", "syn_p2.urdf"]
        names = ["base", "link_0", "link_1"]
        for i, p in enumerate(paths):
            root = ET.parse(p).getroot()
            links = {ln.attrib["name"]: ln for ln in root.findall("link")}
            # only the kept link retains a visual; nobody keeps collision
            for name, ln in links.items():
                assert len(ln.findall("collision")) == 0
                n_vis = len(ln.findall("visual"))
                assert n_vis == (1 if name == names[i] else 0)
                inertial = ln.findall("inertial")
                assert len(inertial) == 1
                mass = inertial[0].find(".//mass").attrib["value"]
                assert float(mass) == (0.0 if name == "base" else 3.0)
            # joints survive intact so the kinematics still load
            assert len(root.findall("joint")) == 2

    def test_generate_synthetic_urdf(self, tmp_path):
        import xml.etree.ElementTree as ET

        from articulated_pose_tpu.tools.urdf_gen import generate_synthetic_urdf

        rng = np.random.RandomState(0)
        paths = generate_synthetic_urdf(3, str(tmp_path / "m"), rng)
        assert len(paths) == 4                      # syn + 3 per-part
        root = ET.parse(paths[0]).getroot()
        links = root.findall("link")
        joints = root.findall("joint")
        assert len(links) == 3 and len(joints) == 2
        for j in joints:
            assert j.attrib["type"] == "revolute"
            assert j.find("axis").attrib["xyz"] == "1 0 0"
            assert j.find("limit") is not None
        # heights normalized to 0.3 and descending
        hs = [float(ln.find(".//box").attrib["size"].split()[2])
              for ln in links]
        np.testing.assert_allclose(sum(hs), 0.3, rtol=1e-6)
        assert hs == sorted(hs, reverse=True)
        # per-part file keeps only its own link's visuals
        p1 = ET.parse(paths[2]).getroot()
        for ln in p1.findall("link"):
            n_vis = len(ln.findall("visual"))
            if ln.attrib["name"] == "1":
                assert n_vis == 2                   # link + joint cylinder
            else:
                assert n_vis == 0
