"""REAL-TPU Pallas kernel parity tests (skipped off-TPU).

The interpreter-mode suite (tests/test_pallas.py) validates kernel
logic; THIS module executes the compiled Mosaic kernels on the chip and
asserts oracle parity at the production shapes, making "exact TPU
parity" a tested claim instead of a docs claim (round-2 verdict item 2).
Run on the dev chip with:  JAX_PLATFORMS='' pytest tests/test_pallas_tpu.py

Conftest forces JAX_PLATFORMS=cpu for the unit suite, so these tests
skip there; the driver/bench environment sees the TPU.

Reference semantics inherited from the CUDA kernels:
tf_sampling_g.cu:105-170 (FPS), tf_grouping_g.cu:17-31 (ball query,
first-nsample-in-index-order, first-hit pad), tf_interpolate.cpp:60-102
(three_nn squared distances, ascending, lowest-index ties).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU parity tests need a TPU backend")


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _clouds(rng, B, N, M):
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    qi = rng.choice(N, size=(B, M))
    q = jnp.stack([xyz[b, qi[b]] for b in range(B)])
    return xyz, q


class TestFPSOnTPU:
    @pytest.mark.parametrize("B,N,M", [(64, 2048, 512), (64, 512, 128)])
    def test_fps_invariant_production_shapes(self, rng, B, N, M):
        from articulated_pose_tpu.ops.pallas import farthest_point_sample_pallas

        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        idx = np.asarray(farthest_point_sample_pallas(M, xyz))
        x = np.asarray(xyz).astype(np.float64)
        # spot-check the FPS invariant on 4 rows (full check is O(B·M·N))
        for b in (0, 1, B // 2, B - 1):
            assert idx[b, 0] == 0
            assert len(set(idx[b].tolist())) == M
            mind = np.full(N, np.inf)
            for j in range(1, M):
                d = np.sum((x[b] - x[b, idx[b, j - 1]]) ** 2, -1)
                mind = np.minimum(mind, d)
                assert mind[idx[b, j]] >= mind.max() * (1 - 1e-4)

    def test_fused_two_level_matches_sequential(self, rng):
        """farthest_point_sample2_pallas on chip == two single-level
        passes + gather, at the backbone's SA1→SA2 production shape."""
        from articulated_pose_tpu.ops.pallas import (
            farthest_point_sample2_pallas, farthest_point_sample_pallas)

        B, N, np1, np2 = 64, 2048, 512, 128
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        i1f, x1f, i2f, x2f = farthest_point_sample2_pallas(np1, np2, xyz)
        i1 = farthest_point_sample_pallas(np1, xyz)
        x1 = jnp.take_along_axis(xyz, i1[..., None], axis=1)
        i2 = farthest_point_sample_pallas(np2, x1)
        np.testing.assert_array_equal(np.asarray(i1f), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(i2f), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(x1f), np.asarray(x1))
        x2 = jnp.take_along_axis(x1, i2[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(x2f), np.asarray(x2))

    def test_fps_large_cloud_auto_block(self, rng):
        """N=32k: the auto batch tile keeps the state VMEM-resident."""
        from articulated_pose_tpu.ops.pallas import farthest_point_sample_pallas

        xyz = jnp.asarray(rng.rand(4, 32768, 3), jnp.float32)
        idx = np.asarray(farthest_point_sample_pallas(128, xyz))
        assert idx.shape == (4, 128)
        for b in range(4):
            assert len(set(idx[b].tolist())) == 128


class TestBallQueryOnTPU:
    @pytest.mark.parametrize("B,N,M,S,r", [(64, 2048, 512, 64, 0.2),
                                           (64, 512, 128, 64, 0.4)])
    def test_rank_select_exact(self, rng, B, N, M, S, r):
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import query_ball_point_pallas

        xyz, q = _clouds(rng, B, N, M)
        idx, cnt = query_ball_point_pallas(r, S, xyz, q)
        idx_r, cnt_r = ops.query_ball_point(r, S, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))

    @pytest.mark.parametrize("transposed", [False, True])
    @pytest.mark.parametrize("B,N,M,S,r", [(64, 2048, 512, 64, 0.2),
                                           (64, 512, 128, 64, 0.4)])
    def test_butterfly_fused_exact(self, rng, B, N, M, S, r, transposed):
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas

        xyz, q = _clouds(rng, B, N, M)
        grouped, cnt, idx = query_ball_group_pallas(r, S, xyz, q,
                                                    emit_idx=True,
                                                    transposed=transposed)
        idx_r, cnt_r = ops.query_ball_point(r, S, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        want = (np.asarray(ops.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        # coordinates ride the butterfly unchanged -> bitwise equal
        np.testing.assert_array_equal(np.asarray(grouped), want)

    @pytest.mark.parametrize("transposed", [False, True])
    @pytest.mark.parametrize("B,N,M,S,r", [(64, 2048, 512, 64, 0.2),
                                           (64, 512, 128, 64, 0.4)])
    def test_butterfly_fused_packed(self, rng, B, N, M, S, r, transposed):
        """packed=True on chip: idx/cnt exact; grouped coords within the
        10-bit quantization bound extent_c/2046 per component."""
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas

        xyz, q = _clouds(rng, B, N, M)
        grouped, cnt, idx = query_ball_group_pallas(r, S, xyz, q,
                                                    emit_idx=True,
                                                    packed=True,
                                                    transposed=transposed)
        idx_r, cnt_r = ops.query_ball_point(r, S, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        want = (np.asarray(ops.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        ext = np.asarray(xyz).max(1) - np.asarray(xyz).min(1)
        bound = ext[:, None, None, :] / 2046.0 + 1e-5
        assert (np.abs(np.asarray(grouped) - want) <= bound).all()

    @pytest.mark.parametrize("B,N,M,S,r", [(64, 2048, 512, 64, 0.2),
                                           (64, 512, 128, 64, 0.4)])
    def test_bucket_tier(self, rng, B, N, M, S, r):
        """Bucket-sampled tier on chip vs its interpreter twin: idx/cnt
        must match exactly (the selection logic is integer); grouped
        coords within the compiled bf16-matmul rounding of the
        interpreter's values.  Boundary-classification noise (f32 d2
        summation order, compiled vs interpreted) may flip hits whose
        distance is within ~1e-5 of the radius — rows touching that
        class are excluded like the streaming test does."""
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket

        xyz, q = _clouds(rng, B, N, M)
        grouped, cnt, idx = query_ball_group_bucket(r, S, xyz, q,
                                                    emit_idx=True)
        g_i, c_i, i_i = query_ball_group_bucket(r, S, xyz, q,
                                                emit_idx=True,
                                                interpret=True)
        d = np.linalg.norm(np.asarray(xyz)[:, None, :, :]
                           - np.asarray(q)[:, :, None, :], axis=-1)
        boundary = (np.abs(d - r) < 1e-5).any(-1)          # (B, M)
        ok = ~boundary
        assert ok.mean() > 0.95
        np.testing.assert_array_equal(np.asarray(cnt)[ok],
                                      np.asarray(c_i)[ok])
        np.testing.assert_array_equal(np.asarray(idx)[ok],
                                      np.asarray(i_i)[ok])
        np.testing.assert_allclose(np.asarray(grouped)[ok],
                                   np.asarray(g_i)[ok], atol=r / 200.0)

    def test_streaming_large_n(self, rng):
        """N=16k blockwise kernel vs oracle; divergence confined to the
        documented f32 radius-boundary class (distances within ~1e-5 of
        the radius may classify differently across summation orders)."""
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import query_ball_point_stream

        B, N, M, S, r = 8, 16384, 512, 64, 0.1
        xyz, q = _clouds(rng, B, N, M)
        idx, cnt = query_ball_point_stream(r, S, xyz, q, block_n=4096)
        idx_r, cnt_r = ops.query_ball_point(r, S, xyz, q)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        idx_r, cnt_r = np.asarray(idx_r), np.asarray(cnt_r)
        mismatch_rows = (idx != idx_r).any(-1) | (cnt != cnt_r)
        frac = mismatch_rows.mean()
        assert frac < 0.01, f"{frac:.4f} of queries diverged"
        # every divergent row must be explained by a boundary-distance hit
        d2 = ((np.asarray(q)[:, :, None, :]
               - np.asarray(xyz)[:, None, :, :]) ** 2).sum(-1)
        for b, m in zip(*np.nonzero(mismatch_rows)):
            border = np.abs(np.sqrt(d2[b, m]) - r) < 1e-4
            assert border.any(), (b, m)


class TestThreeNNOnTPU:
    def test_fused_exact_fp1_shape(self, rng):
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import three_nn_pallas

        B, N, M = 64, 2048, 512
        xyz1 = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        xyz2 = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
        dist, idx = three_nn_pallas(xyz1, xyz2)
        dist_r, idx_r = ops.three_nn(xyz1, xyz2)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_r),
                                   rtol=1e-6, atol=1e-6)

    def test_packed_key_fp1_shape(self, rng):
        """packed=True compiled on chip at the FP1 shape: choices and
        emitted distances stay within the key-truncation band of the
        exact oracle, plus the f32 dot-form cancellation the compiled
        kernel adds (the interpret tier pins tighter bounds because
        XLA-CPU's d2 rounding happens to cancel less)."""
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import three_nn_pallas

        B, N, M = 64, 2048, 512
        xyz1 = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        xyz2 = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
        d_got, i_got = map(np.asarray,
                           three_nn_pallas(xyz1, xyz2, packed=True))
        d_ref, i_ref = map(np.asarray, ops.three_nn(xyz1, xyz2))
        # true d2 of the packed choices (f64 oracle)
        q = np.asarray(xyz1, np.float64)
        p = np.asarray(xyz2, np.float64)
        d_true = np.stack([
            np.take_along_axis(((q[b, :, None] - p[b][None]) ** 2).sum(-1),
                               i_got[b], axis=1) for b in range(B)])
        # d2 is computed on-chip in dot form (|q|^2+|p|^2-2q.p, f32):
        # catastrophic cancellation leaves ~1e-6 ABSOLUTE error for
        # unit-cube clouds (measured 7.1e-7 max on chip), on top of the
        # key truncation which only lowers (< 2^-7 relative).
        assert (d_got <= d_true * (1 + 1e-5) + 4e-6).all()
        assert (d_got >= d_true * (1 - 2 ** -7) - 4e-6).all()
        # selection order is by truncated keys, so per-slot choices can
        # exceed the exact slot by a few truncation quanta when ties
        # compound across the 3 sweeps (measured 2.8% max = 3.5 quanta)
        band = d_ref * (4 * 2 ** -7) + 1e-5
        assert (d_true <= d_ref + band).all()

    def test_streaming_16k(self, rng):
        from articulated_pose_tpu import ops
        from articulated_pose_tpu.ops.pallas import three_nn_stream

        B, N, M = 4, 2048, 16384
        xyz1 = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        xyz2 = jnp.asarray(rng.rand(B, M, 3), jnp.float32)
        dist, idx = three_nn_stream(xyz1, xyz2, block_m=4096)
        dist_r, idx_r = ops.three_nn(xyz1, xyz2)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_r),
                                   rtol=1e-5, atol=1e-6)
