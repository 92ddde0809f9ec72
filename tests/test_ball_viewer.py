"""Ball renderer: native C++ rasterizer vs NumPy fallback parity.

Capability twin of the reference's prebuilt viewer binary
(show3d_balls.py:23); here both implementations are ours, so we can pin
them against each other exactly.
"""

import numpy as np
import pytest

from articulated_pose_tpu import native
from articulated_pose_tpu.utils import ball_viewer


@pytest.fixture
def cloud():
    rng = np.random.RandomState(0)
    xyz = rng.randn(256, 3)
    colors = rng.rand(256, 3) * 255
    return xyz, colors


def test_numpy_render_basic(cloud):
    xyz, colors = cloud
    img = ball_viewer.render_points(xyz, colors, size=200, ballradius=4,
                                    use_native=False)
    assert img.shape == (200, 200, 3) and img.dtype == np.uint8
    assert img.any(), "points must produce non-background pixels"
    # ... but the corners stay background (cloud is centered + scaled)
    assert not img[0, 0].any() and not img[-1, -1].any()


def test_depth_ordering():
    # two overlapping balls; the one with larger z must win the overlap
    xyz = np.array([[100, 100, 0], [100, 100, 50]], np.int32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.float32)
    img = np.zeros((200, 200, 3), np.uint8)
    ball_viewer._render_balls_numpy(img, xyz, colors, ballradius=6)
    assert img[100, 100, 1] > 0 and img[100, 100, 0] == 0


@pytest.mark.skipif(not native.render_available(),
                    reason="native renderer unavailable")
def test_native_matches_numpy(cloud):
    xyz, colors = cloud
    a = ball_viewer.render_points(xyz, colors, size=240, ballradius=5,
                                  xangle=0.3, yangle=-0.4, zoom=1.2,
                                  use_native=True)
    b = ball_viewer.render_points(xyz, colors, size=240, ballradius=5,
                                  xangle=0.3, yangle=-0.4, zoom=1.2,
                                  use_native=False)
    # exact parity, modulo depth ties between distinct points (resolved
    # identically by construction — so demand bit-exactness)
    mismatch = (a != b).any(axis=-1).mean()
    assert mismatch < 0.001, f"native/numpy mismatch on {mismatch:.2%} px"


def test_showpoints_headless(tmp_path, cloud):
    xyz, colors = cloud
    out = tmp_path / "view.png"
    img = ball_viewer.showpoints(xyz, colors, size=160, ballradius=3,
                                 save_path=str(out))
    assert img is not None and img.shape == (160, 160, 3)
    assert out.exists()
