"""PointNet++ set-abstraction / feature-propagation backbone.

TPU-native rebuild of the reference backbone (reference:
pointnet_plusplus/utils/pointnet_util.py:29-236,
pointnet_plusplus/architectures.py:56-95).  All grouping indices come
from articulated_pose_tpu.ops; the per-neighborhood MLPs are pointwise
matmuls batched as (B·M·S, C) on the MXU, and the whole backbone traces
into one XLA program (the reference bounced to CPU for three_nn every
layer, tf_interpolate.cpp:187).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulated_pose_tpu import ops
from articulated_pose_tpu.models.layers import PointConv, SharedMLP

Dtype = Any


def resolve_impl(impl: str) -> str:
    """Resolve a kernel-impl choice against the current backend.

    Pallas TPU kernels only lower on TPU; everywhere else (the CPU test
    mesh, the multichip dryrun) they transparently fall back to the
    XLA implementations, which are oracle-parity tested against the
    same semantics (tests/test_pallas.py).
    """
    if impl != "xla" and jax.default_backend() != "tpu":
        return "xla"
    return impl


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jax.Array, points: Optional[jax.Array],
                     knn: bool = False, use_xyz: bool = True,
                     fps_impl: str = "xla", ball_query_impl: str = "xla",
                     ball_query_packed: bool = False, precomputed_fps=None):
    """FPS → gather → ball-query/knn → group → center-normalize.

    Mirrors pointnet_util.py:29-63. xyz (B, N, 3), points (B, N, C) or None.
    Returns (new_xyz (B,M,3), new_points (B,M,S,3+C), idx, grouped_xyz).
    fps_impl: 'xla' (lax.scan; fuses well inside large programs) or
    'pallas' (VMEM-resident kernel, ops/pallas/fps.py).
    ball_query_impl: 'xla' | 'pallas' (full-N VMEM kernel) | 'stream'
    (blockwise-N kernel for large clouds, ops/pallas/ball_query_stream.py)
    | 'bucket' (MXU segment-sum inference tier, ball_query_bucket.py).
    """
    if precomputed_fps is not None:
        # both FPS levels came from the fused two-level kernel
        # (ops/pallas/fps.py::farthest_point_sample2_pallas)
        fps_idx, new_xyz = precomputed_fps
    elif resolve_impl(fps_impl) == "pallas":
        from articulated_pose_tpu.ops.pallas import farthest_point_sample_pallas

        fps_idx = farthest_point_sample_pallas(npoint, xyz)
        new_xyz = ops.gather_point(xyz, fps_idx)                # (B, M, 3)
    else:
        fps_idx = ops.farthest_point_sample(npoint, xyz)
        new_xyz = ops.gather_point(xyz, fps_idx)                # (B, M, 3)
    grouped_xyz = None
    idx = None
    if knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz)
    else:
        bq = resolve_impl(ball_query_impl)
        if bq == "bucket":
            from articulated_pose_tpu.ops.pallas import query_ball_group_bucket

            # bucket-sampled tier (one hit per N/nsample-lane bucket
            # instead of the first-nsample prefix).  Pallas variant:
            # measured SLOWER than the butterfly at SA1 (35.8 vs 4.2 ms,
            # docs/perf_round4.md) — kept as a validated tier, not a
            # default
            grouped_xyz, _, idx = query_ball_group_bucket(
                radius, nsample, xyz, new_xyz,
                emit_idx=points is not None)
        elif bq == "bucket_xla":
            # same bucket semantics in pure XLA: pairwise-d2 matmul +
            # per-bucket argmin (ops/core.py::query_ball_point_bucket)
            idx, _ = ops.query_ball_point_bucket(radius, nsample, xyz,
                                                 new_xyz)
        elif bq == "pallas":
            from articulated_pose_tpu.ops.pallas import query_ball_group_pallas

            # butterfly-compaction kernel: ball query AND the centered
            # neighborhood coordinates in one pass (bitwise-exact vs the
            # unfused pair; 13.5 -> 6.9 ms at SA1, 4.7 -> 2.4 ms at SA2
            # incl. the flat-take gather it replaces).  The index plane
            # is only carried when a feature gather still needs it.
            # transposed=True routes along SUBLANES — identical outputs,
            # SA1 packed 3.56 -> 2.52 ms / exact 4.83 -> 3.45 ms (lane
            # rolls pay shift-size-dependent Mosaic layout conversions;
            # sublane rolls don't — docs/perf_round4.md).
            grouped_xyz, _, idx = query_ball_group_pallas(
                radius, nsample, xyz, new_xyz,
                emit_idx=points is not None, packed=ball_query_packed,
                transposed=True)
        elif bq == "stream":
            from articulated_pose_tpu.ops.pallas import query_ball_point_stream

            idx, _ = query_ball_point_stream(radius, nsample, xyz, new_xyz)
        else:
            idx, _ = ops.query_ball_point(radius, nsample, xyz, new_xyz)
    if grouped_xyz is None:
        grouped_xyz = ops.group_point(xyz, idx)                 # (B, M, S, 3)
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]      # translation normalize
    if points is not None:
        grouped_points = ops.group_point(points, idx)
        new_points = (jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
                      if use_xyz else grouped_points)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: jax.Array, points: Optional[jax.Array],
                         use_xyz: bool = True):
    """Single global group (pointnet_util.py:66-91)."""
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]                            # (B, 1, N, 3)
    if points is not None:
        new_points = (jnp.concatenate([xyz, points], axis=-1)
                      if use_xyz else points)[:, None]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, None, grouped_xyz


class SetAbstraction(nn.Module):
    """SA module: sample+group, per-neighborhood shared MLP, pool.

    Mirrors pointnet_util.py:94-161 (max pooling path).
    """

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True
    fps_impl: str = "xla"
    ball_query_impl: str = "xla"
    ball_query_packed: bool = False
    dtype: Dtype = jnp.float32
    # pre-pool dtype: the final MLP layer emits this and the pool runs in
    # it (None = dtype).  pool_dtype=f32 under a bf16 trunk keeps the max
    # selection unrounded; the pooled (S× smaller) output is cast back.
    pool_dtype: Optional[Dtype] = None
    # dtype every MLP layer emits (None = dtype) — "bf16 matmuls, f32
    # activations" when f32.  Overrides pool_dtype on the last layer.
    act_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xyz, points, *, train: bool = False, bn_momentum=0.9,
                 precomputed_fps=None):
        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz)
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                self.knn, self.use_xyz, fps_impl=self.fps_impl,
                ball_query_impl=self.ball_query_impl,
                ball_query_packed=self.ball_query_packed,
                precomputed_fps=precomputed_fps)

        new_points = SharedMLP(self.mlp, dtype=self.dtype,
                               out_dtype=self.pool_dtype,
                               act_dtype=self.act_dtype, name="mlp")(
            new_points, train=train, bn_momentum=bn_momentum)   # (B, M, S, C)

        if self.pooling == "max":
            new_points = jnp.max(new_points, axis=2)
        elif self.pooling == "avg":
            new_points = jnp.mean(new_points, axis=2)
        elif self.pooling == "weighted_avg":
            dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
            w = jax.nn.softmax(-dists * 5.0, axis=2)
            new_points = jnp.sum(new_points * w, axis=2)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        # the pooled tensor is S× smaller — cast back to the trunk dtype
        # unless an f32-activation policy is in force
        out = self.act_dtype if self.act_dtype is not None else self.dtype
        return new_xyz, new_points.astype(out), idx


class FeaturePropagation(nn.Module):
    """FP module: 3-NN inverse-distance interpolation + skip concat + MLP.

    Mirrors pointnet_util.py:206-236.
    """

    mlp: Sequence[int]
    three_nn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    act_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, *, train: bool = False,
                 bn_momentum=0.9):
        if xyz2.shape[1] == 1:
            # interpolating from a single global point: copy it everywhere
            interp = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[2]))
        else:
            if resolve_impl(self.three_nn_impl) == "pallas":
                from articulated_pose_tpu.ops.pallas import three_nn_pallas

                dist, idx = three_nn_pallas(xyz1, xyz2)
            else:
                dist, idx = ops.three_nn(xyz1, xyz2)
            weight = ops.interp_weights(dist)
            interp = ops.three_interpolate(points2, idx, weight)
        if points1 is not None:
            interp = jnp.concatenate([interp, points1], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype,
                         act_dtype=self.act_dtype, name="mlp")(
            interp, train=train, bn_momentum=bn_momentum)


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Stage widths; defaults mirror architectures.py:62-93 exactly."""

    sa_npoints: Tuple[int, ...] = (512, 128)
    sa_radii: Tuple[float, ...] = (0.2, 0.4)
    sa_nsamples: Tuple[int, ...] = (64, 64)
    sa_mlps: Tuple[Tuple[int, ...], ...] = ((64, 64, 128), (128, 128, 256))
    global_mlp: Tuple[int, ...] = (256, 512, 1024)
    fp_mlps: Tuple[Tuple[int, ...], ...] = ((256, 256), (256, 128), (128, 128, 128))
    head_width: int = 128
    dropout_rate: float = 0.5
    fps_impl: str = "xla"        # 'xla' | 'pallas' (ops/pallas/fps.py)
    ball_query_impl: str = "xla"  # 'xla'|'pallas'|'stream'|'bucket'|'bucket_xla'
    # packed=True routes the butterfly kernel's coordinates as one
    # 10-bit-quantized i32 plane (<= extent/2046 abs error on grouped
    # coords, idx/cnt exact; ops/pallas/ball_query_butterfly.py)
    ball_query_packed: bool = False
    three_nn_impl: str = "xla"    # 'xla' | 'pallas' (ops/pallas/three_nn.py)


class PointNet2Backbone(nn.Module):
    """Shared segmentation backbone (architectures.py:56-95).

    Input: point cloud (B, N, 3(+C)).  Output: per-point feature (B, N, 128).
    """

    spec: BackboneSpec = BackboneSpec()
    dtype: Dtype = jnp.float32
    # mixed-precision policy under a bf16 trunk (see SetAbstraction)
    pool_dtype: Optional[Dtype] = None
    act_dtype: Optional[Dtype] = None
    # stages forced to f32 regardless of dtype, by module name
    # ("sa1", "sa2", "sa_global", "fp1".."fp3", "fc1").  The gradient
    # bisect (docs/dtype_ab.md) found bf16 SA1 corrupts the whole
    # gradient tree at trained params; its MLPs are a rounding-error
    # share of forward time, so f32 there is ~free.
    f32_stages: Tuple[str, ...] = ()

    def _stage_dtype(self, name: str) -> Dtype:
        return jnp.float32 if name in self.f32_stages else self.dtype

    @nn.compact
    def __call__(self, X, *, train: bool = False, bn_momentum=0.9):
        s = self.spec
        if self.f32_stages:
            # a silently-ignored typo here would undo the bf16-collapse
            # pin (docs/dtype_ab.md) — fail at trace time instead
            valid = ({f"sa{i + 1}" for i in range(len(s.sa_npoints))}
                     | {f"fp{i + 1}" for i in range(len(s.fp_mlps))}
                     | {"sa_global", "fc1"})
            bad = [n for n in self.f32_stages if n not in valid]
            if bad:
                raise ValueError(
                    f"unknown f32_stages {bad}; valid: {sorted(valid)}")
        l_xyz = [X[..., :3].astype(jnp.float32)]
        l_pts = [X[..., 3:] if X.shape[-1] > 3 else None]

        # Both FPS levels in ONE Pallas kernel when the spec has the
        # standard two-stage pyramid: the np1 subset stays VMEM-resident
        # between levels and the inter-level gather disappears
        # (ops/pallas/fps.py::farthest_point_sample2_pallas).
        pre = [None] * len(s.sa_npoints)
        if (resolve_impl(s.fps_impl) == "pallas"
                and len(s.sa_npoints) == 2):
            from articulated_pose_tpu.ops.pallas import \
                farthest_point_sample2_pallas

            i1, x1, i2, x2 = farthest_point_sample2_pallas(
                s.sa_npoints[0], s.sa_npoints[1], l_xyz[0])
            pre = [(i1, x1), (i2, x2)]

        # Set abstraction pyramid
        for i in range(len(s.sa_npoints)):
            xyz, pts, _ = SetAbstraction(
                npoint=s.sa_npoints[i], radius=s.sa_radii[i],
                nsample=s.sa_nsamples[i], mlp=s.sa_mlps[i],
                fps_impl=s.fps_impl, ball_query_impl=s.ball_query_impl,
                ball_query_packed=s.ball_query_packed,
                dtype=self._stage_dtype(f"sa{i + 1}"),
                pool_dtype=self.pool_dtype,
                act_dtype=self.act_dtype, name=f"sa{i + 1}",
            )(l_xyz[-1], l_pts[-1], train=train, bn_momentum=bn_momentum,
              precomputed_fps=pre[i])
            l_xyz.append(xyz)
            l_pts.append(pts)

        xyz, pts, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=s.global_mlp,
            group_all=True, dtype=self._stage_dtype("sa_global"),
            pool_dtype=self.pool_dtype,
            act_dtype=self.act_dtype, name="sa_global",
        )(l_xyz[-1], l_pts[-1], train=train, bn_momentum=bn_momentum)
        l_xyz.append(xyz)
        l_pts.append(pts)

        # Feature propagation back to full resolution; the final FP's skip
        # connection concatenates raw xyz with input features
        # (architectures.py:84-86).
        n_levels = len(l_xyz)
        feats = l_pts[-1]
        for i, fp_mlp in enumerate(s.fp_mlps):
            lvl = n_levels - 2 - i
            skip = l_pts[lvl]
            if lvl == 0:
                skip = (l_xyz[0] if skip is None
                        else jnp.concatenate([l_xyz[0], skip], axis=-1))
            feats = FeaturePropagation(fp_mlp, three_nn_impl=s.three_nn_impl,
                                       dtype=self._stage_dtype(f"fp{i + 1}"),
                                       act_dtype=self.act_dtype,
                                       name=f"fp{i + 1}")(
                l_xyz[lvl], l_xyz[lvl + 1], skip, feats,
                train=train, bn_momentum=bn_momentum)

        # FC head: conv1d(128, bn) + dropout (architectures.py:89-93)
        feats = PointConv(s.head_width, use_bn=True,
                          dtype=self._stage_dtype("fc1"),
                          out_dtype=self.act_dtype, name="fc1")(
            feats, train=train, bn_momentum=bn_momentum)
        feats = nn.Dropout(rate=s.dropout_rate, deterministic=not train,
                           name="dp1")(feats)
        return feats
