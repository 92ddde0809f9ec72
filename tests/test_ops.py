"""Op-level parity tests: XLA implementations vs NumPy oracles.

The oracles (ops/numpy_ref.py) replicate the reference CUDA/C++ op
semantics exactly; these tests pin our XLA ops to them (the test layer
the reference never had — it only gradient-checked two ops, see
SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from articulated_pose_tpu.ops import core
from articulated_pose_tpu.ops import numpy_ref as ref


def make_cloud(rng, B=2, N=128):
    return rng.rand(B, N, 3).astype(np.float32)


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng, B=3, N=96)
        got = np.asarray(core.farthest_point_sample(32, jnp.asarray(xyz)))
        want = ref.farthest_point_sample(32, xyz)
        np.testing.assert_array_equal(got, want)

    def test_first_index_zero(self, rng):
        xyz = make_cloud(rng)
        got = np.asarray(core.farthest_point_sample(8, jnp.asarray(xyz)))
        assert (got[:, 0] == 0).all()

    def test_indices_distinct(self, rng):
        xyz = make_cloud(rng, B=1, N=64)
        got = np.asarray(core.farthest_point_sample(16, jnp.asarray(xyz)))[0]
        assert len(set(got.tolist())) == 16

    def test_npoint_one(self, rng):
        xyz = make_cloud(rng)
        got = np.asarray(core.farthest_point_sample(1, jnp.asarray(xyz)))
        assert got.shape == (2, 1) and (got == 0).all()


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.2, 16), (0.4, 8), (0.1, 32)])
    def test_matches_oracle(self, rng, radius, nsample):
        xyz = make_cloud(rng, B=2, N=100)
        q = xyz[:, :20]
        got_idx, got_cnt = core.query_ball_point(radius, nsample, jnp.asarray(xyz), jnp.asarray(q))
        want_idx, want_cnt = ref.query_ball_point(radius, nsample, xyz, q)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_zero_hits(self):
        xyz = np.ones((1, 8, 3), dtype=np.float32)
        q = np.zeros((1, 1, 3), dtype=np.float32)
        idx, cnt = core.query_ball_point(0.1, 4, jnp.asarray(xyz), jnp.asarray(q))
        assert int(cnt[0, 0]) == 0
        assert (np.asarray(idx) == 0).all()

    def test_self_query_always_hit(self, rng):
        xyz = make_cloud(rng)
        idx, cnt = core.query_ball_point(0.05, 4, jnp.asarray(xyz), jnp.asarray(xyz))
        assert (np.asarray(cnt) >= 1).all()


class TestGrouping:
    def test_group_point(self, rng):
        pts = rng.rand(2, 50, 7).astype(np.float32)
        idx = rng.randint(0, 50, size=(2, 10, 4)).astype(np.int32)
        got = np.asarray(core.group_point(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_allclose(got, ref.group_point(pts, idx), rtol=1e-6)

    def test_group_point_impls_identical(self, rng):
        """'flat' gather and 'onehot' matmul must produce the oracle
        result exactly (the matmul picks exactly one term per row, so it
        is exact even in low precision)."""
        pts = rng.rand(2, 40, 33).astype(np.float32)
        idx = rng.randint(0, 40, size=(2, 6, 5)).astype(np.int32)
        want = ref.group_point(pts, idx)
        for impl in ("flat", "onehot", "auto"):
            got = np.asarray(core.group_point(jnp.asarray(pts),
                                              jnp.asarray(idx), impl=impl))
            np.testing.assert_array_equal(got, want)

    def test_group_point_onehot_grad_is_scatter_add(self, rng):
        pts = rng.rand(1, 10, 2).astype(np.float32)
        idx = np.array([[[0, 0, 3]]], dtype=np.int32)

        def f(p):
            return jnp.sum(core.group_point(p, jnp.asarray(idx),
                                            impl="onehot"))

        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        assert g[0, 0, 0] == 2.0 and g[0, 3, 0] == 1.0 and g[0, 1, 0] == 0.0

    def test_group_point_grad_is_scatter_add(self, rng):
        pts = rng.rand(1, 10, 2).astype(np.float32)
        idx = np.array([[[0, 0, 3]]], dtype=np.int32)  # duplicate index 0

        def f(p):
            return jnp.sum(core.group_point(p, jnp.asarray(idx)))

        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        assert g[0, 0, 0] == 2.0 and g[0, 3, 0] == 1.0 and g[0, 1, 0] == 0.0

    def test_gather_point(self, rng):
        pts = rng.rand(2, 30, 3).astype(np.float32)
        idx = rng.randint(0, 30, size=(2, 5)).astype(np.int32)
        got = np.asarray(core.gather_point(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_allclose(got, ref.gather_point(pts, idx), rtol=1e-6)


class TestThreeNN:
    def test_matches_oracle(self, rng):
        x1 = make_cloud(rng, B=2, N=60)
        x2 = make_cloud(rng, B=2, N=25)
        got_d, got_i = core.three_nn(jnp.asarray(x1), jnp.asarray(x2))
        want_d, want_i = ref.three_nn(x1, x2)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-6)

    def test_squared_distances(self):
        x1 = np.array([[[0.0, 0, 0]]], dtype=np.float32)
        x2 = np.array([[[2.0, 0, 0], [3.0, 0, 0], [5.0, 0, 0]]], dtype=np.float32)
        d, i = core.three_nn(jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(d)[0, 0], [4.0, 9.0, 25.0], rtol=1e-5)

    def test_interpolate(self, rng):
        pts = rng.rand(2, 25, 6).astype(np.float32)
        x1 = make_cloud(rng, B=2, N=40)
        x2 = make_cloud(rng, B=2, N=25)
        d, i = ref.three_nn(x1, x2)
        w = np.asarray(core.interp_weights(jnp.asarray(d)))
        got = np.asarray(core.three_interpolate(jnp.asarray(pts), jnp.asarray(i), jnp.asarray(w)))
        want = ref.three_interpolate(pts, i, w)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_interpolate_grad(self, rng):
        """ThreeInterpolateGrad scatter semantics (tf_interpolate.cpp:241-262)."""
        pts = rng.rand(1, 5, 2).astype(np.float32)
        idx = np.array([[[0, 1, 2], [0, 0, 4]]], dtype=np.int32)
        w = np.full((1, 2, 3), 1 / 3, dtype=np.float32)

        def f(p):
            return jnp.sum(core.three_interpolate(p, jnp.asarray(idx), jnp.asarray(w)))

        g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
        np.testing.assert_allclose(g[0, 0, 0], 1.0, rtol=1e-5)  # 1/3 * 3 hits
        np.testing.assert_allclose(g[0, 3, 0], 0.0)


class TestMisc:
    def test_knn(self, rng):
        xyz = make_cloud(rng, B=1, N=30)
        d, i = core.knn_point(4, jnp.asarray(xyz), jnp.asarray(xyz[:, :5]))
        # nearest neighbor of a query drawn from the cloud is itself
        np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(5))
        assert (np.diff(np.asarray(d), axis=-1) >= -1e-6).all()

    def test_prob_sample(self, rng):
        w = rng.rand(2, 50).astype(np.float32)
        u = rng.rand(2, 100).astype(np.float32)
        got = np.asarray(core.prob_sample(jnp.asarray(w), jnp.asarray(u)))
        want = ref.prob_sample(w, u)
        np.testing.assert_array_equal(got, want)

    def test_pairwise_sqdist(self, rng):
        a = rng.rand(2, 10, 3).astype(np.float32)
        b = rng.rand(2, 7, 3).astype(np.float32)
        got = np.asarray(core.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        want = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
