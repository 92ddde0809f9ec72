"""ANCSH multi-head model.

Rebuild of the reference model assembly (reference: lib/architecture.py:
86-208 `get_per_point_model_new` + `joint_est_model`):

Heads over the shared PointNet++ per-point feature:
- W: part segmentation, (B, N, K) softmax
- nocs_per_point: per-part NOCS, (B, N, 3K) sigmoid
- [ANCSH only] global_scale (B, N, K) sigmoid, global_translation
  (B, N, 3K) tanh; gocs = nocs * scale(tiled 3x) + trans
  (lib/architecture.py:152-158)
- confi_per_point: (B, N, 1) sigmoid
- joint head (2×(128 conv+bn+dropout) trunk, lib/architecture.py:195-208):
  joint_axis (B,N,3) tanh, unitvec (B,N,3) tanh, heatmap (B,N,1) sigmoid,
  index_per_point (B,N,K) softmax

The early-split variant gives the part-NOCS head a private 128-wide
branch (lib/architecture.py:105-114).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulated_pose_tpu.models.layers import PointConv
from articulated_pose_tpu.models.pointnet2 import BackboneSpec, PointNet2Backbone

Dtype = Any


class JointHead(nn.Module):
    """Joint-parameter head (lib/architecture.py:195-208)."""

    n_parts: int
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, *, train: bool = False, bn_momentum=0.9):
        x = feat
        for j in range(2):
            x = PointConv(128, use_bn=True, dtype=self.dtype, name=f"fc3_{j}")(
                x, train=train, bn_momentum=bn_momentum)
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train,
                           name=f"dp_{j}")(x)
        head = lambda d, name: PointConv(  # noqa: E731
            d, use_bn=False, activation=None, dtype=self.dtype, name=name)(x)
        joint_axis = jnp.tanh(head(3, "fc4_0").astype(jnp.float32))
        unitvec = jnp.tanh(head(3, "fc4_1").astype(jnp.float32))
        heatmap = jax.nn.sigmoid(head(1, "fc4_2").astype(jnp.float32))
        joint_cls = jax.nn.softmax(
            head(self.n_parts, "fc4_3").astype(jnp.float32), axis=-1)
        return joint_axis, unitvec, heatmap, joint_cls


class ANCSHModel(nn.Module):
    """Full per-point multi-head model.

    `mixed` selects ANCSH mode (part + global NOCS); otherwise NPCS
    (part NOCS only) — reference main.py:42-52 presets.
    """

    n_max_parts: int = 3
    mixed: bool = True
    pred_joint: bool = True
    early_split_nocs: bool = True
    backbone_spec: BackboneSpec = BackboneSpec()
    dtype: Dtype = jnp.float32
    # dtype for the output heads (fc11/fc2 + JointHead); None = `dtype`.
    # Lets a bf16 trunk keep f32 head logits — the mixed-precision
    # recipe A/B'd in docs/dtype_ab.md for the bf16 training collapse.
    head_dtype: Dtype = None
    # backbone mixed-precision policy (see PointNet2Backbone):
    # pool_dtype=f32 keeps the pre-pool activation/selection unrounded;
    # act_dtype=f32 keeps ALL inter-layer activations f32 (bf16 matmuls
    # only).
    pool_dtype: Dtype = None
    act_dtype: Dtype = None
    # backbone stages pinned to f32 under a bf16 trunk (see
    # PointNet2Backbone.f32_stages)
    f32_stages: tuple = ()

    @nn.compact
    def __call__(self, P, *, train: bool = False, bn_momentum=0.9) -> Dict[str, jax.Array]:
        K = self.n_max_parts
        hdt = self.dtype if self.head_dtype is None else self.head_dtype
        feat = PointNet2Backbone(self.backbone_spec, dtype=self.dtype,
                                 pool_dtype=self.pool_dtype,
                                 act_dtype=self.act_dtype,
                                 f32_stages=tuple(self.f32_stages),
                                 name="backbone")(
            P, train=train, bn_momentum=bn_momentum)

        out_dims = [K, 3 * K]                      # seg + part NOCS
        if self.mixed:
            out_dims += [K, 3 * K]                 # global scale + translation
        out_dims.append(1)                         # confidence

        results = []
        for idx, d in enumerate(out_dims):
            x = feat
            if self.early_split_nocs and idx == 1:
                # private branch for part-NOCS (lib/architecture.py:110-113)
                x = PointConv(128, use_bn=False, activation=None,
                              dtype=hdt, name=f"fc11_{idx}")(x)
            logits = PointConv(d, use_bn=False, activation=None,
                               dtype=hdt, name=f"fc2_{idx}")(x)
            results.append(logits.astype(jnp.float32))

        if self.mixed:
            w_logits, nocs_logits, scale_logits, trans_logits, confi_logits = results
            scale = jax.nn.sigmoid(scale_logits)               # (B, N, K)
            trans = jnp.tanh(trans_logits)                     # (B, N, 3K)
        else:
            w_logits, nocs_logits, confi_logits = results

        W = jax.nn.softmax(w_logits, axis=-1)
        nocs = jax.nn.sigmoid(nocs_logits)
        confi = jax.nn.sigmoid(confi_logits)

        pred: Dict[str, jax.Array] = {
            "W": W,
            "nocs_per_point": nocs,
            "confi_per_point": confi,
        }

        if self.pred_joint:
            joint_axis, unitvec, heatmap, joint_cls = JointHead(
                n_parts=K, dtype=hdt, name="joint_net")(
                feat, train=train, bn_momentum=bn_momentum)
            pred.update({
                "joint_axis_per_point": joint_axis,
                "unitvec_per_point": unitvec,
                "heatmap_per_point": heatmap,
                "index_per_point": joint_cls,
            })

        if self.mixed:
            B, N = nocs.shape[:2]
            # tile scale K -> 3K interleaved per part (architecture.py:154)
            scale_tiled = jnp.repeat(scale, 3, axis=-1)
            pred["gocs_per_point"] = nocs * scale_tiled + trans
            pred["global_scale"] = scale
            pred["global_translation"] = trans

        return pred


def build_model(config) -> ANCSHModel:
    """Construct the model from a NetworkConfig.

    config.use_pallas selects the Pallas kernel tier for the backbone:
    FPS (7× over the XLA scan: 2.8 vs 20.2 ms at 2048→512, B=64 v5e)
    and the rank-select ball query (7.4 vs 11.6 ms XLA rank-sum at L1,
    tie at L2 — docs/perf_round2.md).  On non-TPU backends Pallas
    resolves back to XLA (models/pointnet2.py::resolve_impl).
    """
    impl = "pallas" if config.use_pallas else "xla"
    widths = {}
    if getattr(config, "backbone_preset", "reference") == "tiny":
        # same topology, trimmed widths: CLI smokes / compile-bound CI
        widths = dict(sa_npoints=(64, 32), sa_nsamples=(16, 16),
                      sa_mlps=((16, 16), (16, 32)), global_mlp=(32, 64),
                      fp_mlps=((32,), (32,), (16, 16)), head_width=16)
    return ANCSHModel(
        n_max_parts=config.n_max_parts,
        mixed=config.is_mixed,
        pred_joint=config.pred_joint,
        early_split_nocs=config.early_split_nocs,
        backbone_spec=BackboneSpec(dropout_rate=config.dropout_rate,
                                   fps_impl=impl, ball_query_impl=impl,
                                   ball_query_packed=config.ball_query_packed,
                                   three_nn_impl=impl, **widths),
        dtype=jnp.dtype(config.compute_dtype),
        head_dtype=(None if config.head_compute_dtype is None
                    else jnp.dtype(config.head_compute_dtype)),
        pool_dtype=(None if config.pool_compute_dtype is None
                    else jnp.dtype(config.pool_compute_dtype)),
        act_dtype=(None if config.act_compute_dtype is None
                   else jnp.dtype(config.act_compute_dtype)),
        f32_stages=tuple(config.f32_stages),
    )
