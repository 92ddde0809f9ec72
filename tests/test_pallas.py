"""Pallas kernel tests (interpreter mode on the CPU test mesh).

Real-TPU execution/parity is exercised by bench.py; here the kernels run
in the Pallas interpreter and are validated against the FPS *invariant*
(each pick maximizes the min distance to the picked set) rather than
bit-exact index equality — f32 ties may legally resolve differently
between implementations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from articulated_pose_tpu.ops import core
from articulated_pose_tpu.ops.pallas.fps import farthest_point_sample_pallas


def assert_valid_fps(xyz: np.ndarray, idx: np.ndarray, rtol=1e-4):
    """Check the FPS invariant in float64 for one (N,3) cloud."""
    x = xyz.astype(np.float64)
    N = x.shape[0]
    assert idx[0] == 0
    mind = np.full(N, np.inf)
    for j in range(1, len(idx)):
        d = np.sum((x - x[idx[j - 1]]) ** 2, -1)
        mind = np.minimum(mind, d)
        # the chosen point's running min-dist must be within tolerance of
        # the global max (exact under f64; tolerance absorbs f32 kernels)
        assert mind[idx[j]] >= mind.max() * (1 - rtol), (j, mind[idx[j]], mind.max())


class TestPallasFPS:
    def test_invariant_small(self, rng):
        xyz = rng.rand(4, 256, 3).astype(np.float32)
        out = np.asarray(farthest_point_sample_pallas(
            64, jnp.asarray(xyz), 4, True))
        for b in range(4):
            assert_valid_fps(xyz[b], out[b])
            assert len(set(out[b].tolist())) == 64  # picks are distinct

    def test_matches_xla_mostly(self, rng):
        xyz = rng.rand(2, 128, 3).astype(np.float32)
        got = np.asarray(farthest_point_sample_pallas(
            32, jnp.asarray(xyz), 2, True))
        want = np.asarray(core.farthest_point_sample(32, jnp.asarray(xyz)))
        # identical up to rare f32 ties
        agreement = (got == want).mean()
        assert agreement > 0.95, agreement

    def test_padding_lanes_ignored(self, rng):
        # N not a multiple of 128 exercises the lane-padding mask
        xyz = rng.rand(2, 100, 3).astype(np.float32)
        out = np.asarray(farthest_point_sample_pallas(
            16, jnp.asarray(xyz), 2, True))
        assert (out < 100).all()
        for b in range(2):
            assert_valid_fps(xyz[b], out[b])

    def test_batch_padding(self, rng):
        # B not a multiple of block_b exercises batch padding
        xyz = rng.rand(3, 128, 3).astype(np.float32)
        out = np.asarray(farthest_point_sample_pallas(
            8, jnp.asarray(xyz), 2, True))
        assert out.shape == (3, 8)
        for b in range(3):
            assert_valid_fps(xyz[b], out[b])


class TestPallasBallQuery:
    def test_matches_oracle(self, rng):
        from articulated_pose_tpu.ops import numpy_ref as ref
        from articulated_pose_tpu.ops.pallas.ball_query import (
            query_ball_point_pallas)

        xyz = rng.rand(2, 100, 3).astype(np.float32)
        q = xyz[:, :20]
        idx, cnt = query_ball_point_pallas(0.3, 8, jnp.asarray(xyz),
                                           jnp.asarray(q), True)
        want_idx, want_cnt = ref.query_ball_point(0.3, 8, xyz, q)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)

    def test_zero_hits(self):
        from articulated_pose_tpu.ops.pallas.ball_query import (
            query_ball_point_pallas)

        xyz = jnp.ones((1, 8, 3))
        q = jnp.zeros((1, 4, 3))
        idx, cnt = query_ball_point_pallas(0.1, 4, xyz, q, True)
        assert (np.asarray(cnt) == 0).all()
        assert (np.asarray(idx) == 0).all()

    def test_padding(self, rng):
        from articulated_pose_tpu.ops import core
        from articulated_pose_tpu.ops.pallas.ball_query import (
            query_ball_point_pallas)

        # N and M both off the 128 grid
        xyz = rng.rand(2, 150, 3).astype(np.float32)
        q = xyz[:, :37]
        idx, cnt = query_ball_point_pallas(0.25, 16, jnp.asarray(xyz),
                                           jnp.asarray(q), True)
        w_idx, w_cnt = core.query_ball_point(0.25, 16, jnp.asarray(xyz),
                                             jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(w_cnt))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(w_idx))


class TestStreamingBallQuery:
    def test_multiblock_matches_oracle(self, rng):
        from articulated_pose_tpu.ops import numpy_ref as ref
        from articulated_pose_tpu.ops.pallas.ball_query_stream import (
            query_ball_point_stream)

        xyz = rng.rand(2, 300, 3).astype(np.float32)   # 3 N-blocks of 128
        q = xyz[:, :20]
        idx, cnt = query_ball_point_stream(0.3, 8, jnp.asarray(xyz),
                                           jnp.asarray(q), 128, True)
        w_idx, w_cnt = ref.query_ball_point(0.3, 8, xyz, q)
        np.testing.assert_array_equal(np.asarray(cnt), w_cnt)
        np.testing.assert_array_equal(np.asarray(idx), w_idx)

    def test_hits_span_blocks(self, rng):
        """Queries whose neighborhoods cross tile boundaries keep global
        index order."""
        from articulated_pose_tpu.ops import numpy_ref as ref
        from articulated_pose_tpu.ops.pallas.ball_query_stream import (
            query_ball_point_stream)

        # clustered cloud: many points within radius spread over blocks
        base = rng.rand(1, 1, 3).astype(np.float32)
        xyz = base + rng.randn(1, 260, 3).astype(np.float32) * 0.05
        q = base.repeat(4, axis=1)
        idx, cnt = query_ball_point_stream(0.2, 16, jnp.asarray(xyz),
                                           jnp.asarray(q), 128, True)
        w_idx, w_cnt = ref.query_ball_point(0.2, 16, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), w_idx)
        np.testing.assert_array_equal(np.asarray(cnt), w_cnt)


class TestPallasThreeNN:
    def test_matches_xla(self, rng):
        from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
        q = jnp.asarray(rng.rand(2, 140, 3), jnp.float32)
        p = jnp.asarray(rng.rand(2, 70, 3), jnp.float32)
        d_ref, i_ref = core.three_nn(q, p)
        d_got, i_got = three_nn_pallas(q, p, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_duplicate_points_tie_to_lowest_index(self, rng):
        from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
        p_np = rng.rand(1, 40, 3).astype(np.float32)
        p_np[0, 17] = p_np[0, 3]            # exact duplicate
        q = jnp.asarray(p_np[:, 3:4])
        p = jnp.asarray(p_np)
        _, idx = three_nn_pallas(q, p, interpret=True)
        assert int(idx[0, 0, 0]) == 3        # lowest index wins the tie

    def test_packed_key_within_truncation(self, rng):
        """packed=True: neighbor choice may legally differ from the exact
        kernel only within the 2^-8 key truncation; emitted dist is the
        truncated true d2 of the chosen neighbor (always <= exact)."""
        from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
        q = jnp.asarray(rng.rand(2, 140, 3), jnp.float32)
        p = jnp.asarray(rng.rand(2, 70, 3), jnp.float32)
        d_ref, i_ref = core.three_nn(q, p)
        d_got, i_got = three_nn_pallas(q, p, interpret=True, packed=True)
        d_ref, i_ref, d_got, i_got = map(np.asarray,
                                         (d_ref, i_ref, d_got, i_got))
        # true d2 of the packed choices, in f64
        qq = np.asarray(q, np.float64)
        pp = np.asarray(p, np.float64)
        d_true = np.stack([
            np.take_along_axis(
                ((qq[b, :, None] - pp[b][None]) ** 2).sum(-1),
                i_got[b], axis=1)
            for b in range(2)])
        # emitted dist: truncation of the choice's d2 (within f32 noise)
        assert (d_got <= d_true * (1 + 1e-5) + 1e-7).all()
        assert (d_got >= d_true * (1 - 2 ** -7) - 1e-7).all()
        # each chosen k-th neighbor is within the truncation band of the
        # exact k-th (sorted ascending both ways by construction)
        band = np.maximum(d_ref * 2 ** -7, 1e-7)
        assert (d_true <= d_ref + band).all()
        # where keys can't tie (gap above truncation), idx must agree
        gap_safe = d_ref * 2 ** -6
        disagree = i_got != i_ref
        assert (np.abs(d_true - d_ref)[disagree] <=
                gap_safe[disagree]).all()

    def test_packed_duplicate_tie_lowest_index(self, rng):
        from articulated_pose_tpu.ops.pallas.three_nn import three_nn_pallas
        p_np = rng.rand(1, 40, 3).astype(np.float32)
        p_np[0, 17] = p_np[0, 3]
        q = jnp.asarray(p_np[:, 3:4])
        _, idx = three_nn_pallas(jnp.asarray(q), jnp.asarray(p_np),
                                 interpret=True, packed=True)
        assert int(idx[0, 0, 0]) == 3


class TestStreamingThreeNN:
    def test_multitile_matches_xla(self, rng):
        from articulated_pose_tpu.ops.pallas.three_nn_stream import three_nn_stream
        q = jnp.asarray(rng.rand(2, 100, 3), jnp.float32)
        p = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
        d_ref, i_ref = core.three_nn(q, p)
        # block_m=128 -> 3 candidate tiles; best-3 must merge across them
        d_got, i_got = three_nn_stream(q, p, block_m=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_cross_tile_tie_lowest_index(self, rng):
        from articulated_pose_tpu.ops.pallas.three_nn_stream import three_nn_stream
        p_np = rng.rand(1, 300, 3).astype(np.float32)
        p_np[0, 260] = p_np[0, 10]           # duplicate in a LATER tile
        q = jnp.asarray(p_np[:, 10:11])
        p = jnp.asarray(p_np)
        _, idx = three_nn_stream(q, p, block_m=128, interpret=True)
        assert int(idx[0, 0, 0]) == 10       # earlier tile wins the tie


class TestGroupedBallQuery:
    def test_matches_separate_gather(self, rng):
        from articulated_pose_tpu.ops.pallas.ball_query import (
            query_ball_point_grouped_pallas)
        xyz = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
        q = jnp.asarray(rng.rand(2, 140, 3), jnp.float32)
        idx_g, cnt_g, grouped = query_ball_point_grouped_pallas(
            0.25, 16, xyz, q, interpret=True)
        idx_r, cnt_r = core.query_ball_point(0.25, 16, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt_g), np.asarray(cnt_r))
        want = (np.asarray(core.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        np.testing.assert_allclose(np.asarray(grouped), want,
                                   rtol=1e-6, atol=1e-6)

    def test_zero_hit_queries_use_point_zero(self):
        from articulated_pose_tpu.ops.pallas.ball_query import (
            query_ball_point_grouped_pallas)
        xyz = jnp.asarray(np.random.RandomState(0).rand(1, 64, 3), jnp.float32)
        q = jnp.asarray([[[50.0, 50.0, 50.0]]], jnp.float32)  # far away
        idx, cnt, grouped = query_ball_point_grouped_pallas(
            0.1, 8, xyz, q, interpret=True)
        assert int(cnt[0, 0]) == 0 and int(idx[0, 0, 0]) == 0
        want = np.asarray(xyz)[0, 0] - np.asarray(q)[0, 0]
        np.testing.assert_allclose(np.asarray(grouped)[0, 0, 0], want,
                                   rtol=1e-6)


class TestButterflyBallQuery:
    """Fused ball-query + grouped-xyz via monotone butterfly compaction
    (ops/pallas/ball_query_butterfly.py) — the production SA-stage path."""

    def test_matches_oracle_exact(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(2, 300, 3), jnp.float32)
        q = jnp.asarray(rng.rand(2, 140, 3), jnp.float32)
        grouped, cnt, idx = query_ball_group_pallas(
            0.25, 16, xyz, q, emit_idx=True, interpret=True)
        idx_r, cnt_r = core.query_ball_point(0.25, 16, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        want = (np.asarray(core.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        np.testing.assert_allclose(np.asarray(grouped), want,
                                   rtol=1e-6, atol=1e-6)

    def test_no_idx_path_matches(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(1, 512, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 128, 3), jnp.float32)
        g1, c1, i1 = query_ball_group_pallas(0.3, 32, xyz, q,
                                             emit_idx=True, interpret=True)
        g2, c2, i2 = query_ball_group_pallas(0.3, 32, xyz, q,
                                             emit_idx=False, interpret=True)
        assert i2 is None and i1 is not None
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_zero_hit_queries_use_point_zero(self):
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(np.random.RandomState(0).rand(1, 64, 3), jnp.float32)
        q = jnp.asarray([[[50.0, 50.0, 50.0]]], jnp.float32)
        grouped, cnt, idx = query_ball_group_pallas(
            0.1, 8, xyz, q, emit_idx=True, interpret=True)
        assert int(cnt[0, 0]) == 0 and int(idx[0, 0, 0]) == 0
        want = np.asarray(xyz)[0, 0] - np.asarray(q)[0, 0]
        np.testing.assert_allclose(np.asarray(grouped)[0, 0, 0], want,
                                   rtol=1e-6)

    def test_saturated_neighborhoods(self, rng):
        """More hits than nsample: first-S-in-index-order must hold."""
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(1, 256, 3) * 0.05, jnp.float32)  # dense
        q = xyz[:, :32]
        grouped, cnt, idx = query_ball_group_pallas(
            0.2, 8, xyz, q, emit_idx=True, interpret=True)
        idx_r, cnt_r = core.query_ball_point(0.2, 8, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        assert int(np.asarray(cnt).min()) == 8  # everything saturated

    @pytest.mark.parametrize("B,N,M,S,r", [(2, 256, 128, 32, 0.2),
                                           (2, 300, 100, 16, 0.35),
                                           (1, 512, 128, 64, 0.4)])
    def test_packed_variant(self, rng, B, N, M, S, r):
        """packed=True: idx/cnt exact, grouped coords within the 10-bit
        quantization bound (extent_c/2046 per component).  The N=300 case
        exercises the masked bbox (wrapper pads lanes with 1e9)."""
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])
        grouped, cnt, idx = query_ball_group_pallas(
            r, S, xyz, q, emit_idx=True, interpret=True, packed=True)
        idx_r, cnt_r = core.query_ball_point(r, S, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        want = (np.asarray(core.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        ext = np.asarray(xyz).max(1) - np.asarray(xyz).min(1)     # (B, 3)
        bound = ext[:, None, None, :] / 2046.0 + 1e-5
        assert (np.abs(np.asarray(grouped) - want) <= bound).all()

    def test_packed_no_idx_path_matches(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(1, 512, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 128, 3), jnp.float32)
        g1, c1, i1 = query_ball_group_pallas(0.3, 32, xyz, q, emit_idx=True,
                                             interpret=True, packed=True)
        g2, c2, i2 = query_ball_group_pallas(0.3, 32, xyz, q, emit_idx=False,
                                             interpret=True, packed=True)
        assert i2 is None and i1 is not None
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # fast tier keeps the production combo (packed, no idx — the
    # backbone inference path); the other three combos are each ~10-15s
    # of interpret-mode compiles and run under RUN_SLOW
    @pytest.mark.parametrize("packed,emit_idx", [
        pytest.param(False, False, marks=pytest.mark.slow),
        pytest.param(False, True, marks=pytest.mark.slow),
        (True, False),
        pytest.param(True, True, marks=pytest.mark.slow),
    ])
    def test_transposed_matches_lane_variant(self, rng, packed, emit_idx):
        """Sublane-routing twin: bitwise-identical to the lane kernel."""
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        B, N, M, S, r = 2, 300, 140, 16, 0.25
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])
        ref = query_ball_group_pallas(r, S, xyz, q, emit_idx=emit_idx,
                                      interpret=True, packed=packed)
        got = query_ball_group_pallas(r, S, xyz, q, emit_idx=emit_idx,
                                      interpret=True, packed=packed,
                                      transposed=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        if emit_idx:
            np.testing.assert_array_equal(np.asarray(got[2]),
                                          np.asarray(ref[2]))
        else:
            assert got[2] is None

    def test_transposed_exact_matches_oracle(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_pallas
        xyz = jnp.asarray(rng.rand(1, 512, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 128, 3), jnp.float32)
        grouped, cnt, idx = query_ball_group_pallas(
            0.3, 32, xyz, q, emit_idx=True, interpret=True, transposed=True)
        idx_r, cnt_r = core.query_ball_point(0.3, 32, xyz, q)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_r))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        want = (np.asarray(core.group_point(xyz, idx_r))
                - np.asarray(q)[:, :, None, :])
        np.testing.assert_allclose(np.asarray(grouped), want,
                                   rtol=1e-6, atol=1e-6)


class TestFPSAutoBlock:
    def test_auto_block_large_cloud(self, rng):
        """N=32k auto-sizes the batch tile so the working set fits VMEM
        (the round-2 kernel's fixed block_b=64 needed ~33 MB)."""
        xyz = rng.rand(2, 32768, 3).astype(np.float32)
        out = np.asarray(farthest_point_sample_pallas(
            8, jnp.asarray(xyz), 0, True))
        for b in range(2):
            assert out[b, 0] == 0
            assert len(set(out[b].tolist())) == 8

    def test_oversize_cloud_raises(self):
        xyz = jnp.zeros((1, 1 << 20, 3), jnp.float32)
        with pytest.raises(ValueError, match="VMEM"):
            farthest_point_sample_pallas(4, xyz, 0, True)


class TestFusedTwoLevelFPS:
    def test_matches_sequential(self, rng):
        """fps2 == fps(np1) -> gather -> fps(np2) -> gather, exactly."""
        from articulated_pose_tpu.ops.pallas import (
            farthest_point_sample2_pallas, farthest_point_sample_pallas)
        xyz = jnp.asarray(rng.rand(3, 512, 3), jnp.float32)
        i1, x1, i2, x2 = farthest_point_sample2_pallas(128, 32, xyz, 0, True)
        i1_ref = farthest_point_sample_pallas(128, xyz, 0, True)
        x1_ref = core.gather_point(xyz, i1_ref)
        i2_ref = farthest_point_sample_pallas(32, x1_ref, 0, True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1_ref))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_ref))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i2_ref))
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(core.gather_point(x1_ref, i2_ref)))


def _bucket_oracle(xyz, q, radius, nsample):
    """NumPy oracle of the bucket-tier semantics
    (ops/pallas/ball_query_bucket.py): slot j = first in-radius point of
    lanes [j*W, (j+1)*W), W = padded_N/nsample; unfilled slots repeat
    the first filled slot; zero hits -> point 0; cnt exact (capped)."""
    B, N, _ = xyz.shape
    M = q.shape[1]
    n_pad = -(-N // 128) * 128
    W = n_pad // nsample
    idx = np.zeros((B, M, nsample), np.int32)
    cnt = np.zeros((B, M), np.int32)
    grouped = np.zeros((B, M, nsample, 3), np.float32)
    for b in range(B):
        for m in range(M):
            d = np.linalg.norm(xyz[b] - q[b, m], axis=-1)
            hits = np.where(d < radius)[0]
            cnt[b, m] = min(len(hits), nsample)
            slot_idx = np.full(nsample, -1, np.int64)
            for j in range(nsample):
                in_b = hits[(hits >= j * W) & (hits < (j + 1) * W)]
                if len(in_b):
                    slot_idx[j] = in_b[0]
            filled = slot_idx >= 0
            if filled.any():
                first = slot_idx[filled][0]
                slot_idx[~filled] = first
            else:
                slot_idx[:] = 0
            idx[b, m] = slot_idx
            grouped[b, m] = xyz[b][slot_idx] - q[b, m]
    return grouped, cnt, idx


@pytest.mark.slow
class TestBucketBallQuery:
    """Bucket-sampled ball query (MXU segment-sum inference tier,
    ops/pallas/ball_query_bucket.py) vs its NumPy oracle.

    Whole class slow: the bucket tier is a measured dead end kept
    deliberately (8.5x slower than butterfly, docs/perf_round4.md) and
    is selected by no production config — its ~30s of interpret-mode
    oracle checks don't belong in the default tier."""

    @pytest.mark.parametrize("B,N,M,S,r", [(2, 256, 128, 32, 0.2),
                                           (1, 512, 128, 64, 0.4),
                                           (2, 200, 64, 32, 0.3)])
    def test_matches_oracle(self, rng, B, N, M, S, r):
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])
        grouped, cnt, idx = query_ball_group_bucket(
            r, S, xyz, q, emit_idx=True, interpret=True)
        want_g, want_c, want_i = _bucket_oracle(
            np.asarray(xyz), np.asarray(q), r, S)
        np.testing.assert_array_equal(np.asarray(cnt), want_c)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        # coords ride one bf16 matmul: bf16-grade rounding on the
        # centered offsets
        np.testing.assert_allclose(np.asarray(grouped), want_g,
                                   atol=r / 220.0)

    def test_every_slot_is_a_true_hit_or_fill(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        xyz = jnp.asarray(rng.rand(1, 512, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        grouped, cnt, idx = query_ball_group_bucket(
            0.35, 64, xyz, q, emit_idx=True, interpret=True)
        d = np.linalg.norm(np.asarray(grouped), axis=-1)
        c = np.asarray(cnt)
        # wherever the query has any hit, every slot holds an in-radius pt
        assert (d[c > 0] < 0.35 + 1e-2).all()

    def test_zero_hit_queries_use_point_zero(self):
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        xyz = jnp.asarray(np.random.RandomState(0).rand(1, 128, 3),
                          jnp.float32)
        q = jnp.asarray([[[50.0, 50.0, 50.0]]], jnp.float32)
        grouped, cnt, idx = query_ball_group_bucket(
            0.1, 16, xyz, q, emit_idx=True, interpret=True)
        assert int(cnt[0, 0]) == 0 and int(idx[0, 0, 0]) == 0
        want = np.asarray(xyz)[0, 0] - np.asarray(q)[0, 0]
        np.testing.assert_allclose(np.asarray(grouped)[0, 0, 0], want,
                                   rtol=1e-2)

    def test_no_idx_path_matches(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        xyz = jnp.asarray(rng.rand(1, 256, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        g1, c1, i1 = query_ball_group_bucket(0.3, 32, xyz, q,
                                             emit_idx=True, interpret=True)
        g2, c2, i2 = query_ball_group_bucket(0.3, 32, xyz, q,
                                             emit_idx=False, interpret=True)
        assert i2 is None and i1 is not None
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_non_pow2_bucket_rejected(self, rng):
        from articulated_pose_tpu.ops.pallas import query_ball_group_bucket
        xyz = jnp.asarray(rng.rand(1, 384, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        with pytest.raises(ValueError, match="bucket"):
            query_ball_group_bucket(0.3, 16, xyz, q, interpret=True)


class TestBucketBallQueryXLA:
    """Pure-XLA twin (ops/core.py::query_ball_point_bucket) of the
    Pallas bucket tier: same semantics, same NumPy oracle."""

    @pytest.mark.parametrize("B,N,M,S,r", [(2, 256, 128, 32, 0.2),
                                           (1, 512, 128, 64, 0.4),
                                           (2, 200, 64, 32, 0.3)])
    def test_matches_oracle(self, rng, B, N, M, S, r):
        from articulated_pose_tpu import ops
        xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
        qi = rng.choice(N, size=(B, M))
        q = jnp.stack([xyz[b, qi[b]] for b in range(B)])
        idx, cnt = ops.query_ball_point_bucket(r, S, xyz, q)
        _, want_c, want_i = _bucket_oracle(np.asarray(xyz), np.asarray(q),
                                           r, S)
        np.testing.assert_array_equal(np.asarray(cnt), want_c)
        np.testing.assert_array_equal(np.asarray(idx), want_i)

    def test_non_pow2_bucket_rejected(self, rng):
        from articulated_pose_tpu import ops
        xyz = jnp.asarray(rng.rand(1, 384, 3), jnp.float32)
        q = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        with pytest.raises(ValueError, match="bucket"):
            ops.query_ball_point_bucket(0.3, 16, xyz, q)
