"""Pallas TPU kernel: ball query (radius neighborhood search).

TPU-native counterpart of the reference CUDA kernel
(reference: tf_ops/grouping/tf_grouping_g.cu:3-36), preserving its exact
semantics: for each query, the FIRST `nsample` points (in index order)
with euclidean distance < radius; all slots pre-filled with the first
hit; per-query hit count capped at nsample.

Kernel design:
- the (BM, N) squared-distance tile is ONE jnp.dot on the MXU
  (|q|² + |p|² − 2·q·pᵀ) computed entirely in VMEM,
- "first nsample in index order" = nsample successive masked arg-mins
  over an order-encoding key plane — the same selection the CUDA scan
  makes sequentially per thread, here vectorized across all queries in
  the block on the VPU,
- grid tiles (batch × query blocks); points stay resident per batch row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ballq_kernel(radius: float, nsample: int, n_valid: int,
                  xyz_ref, q_ref, idx_ref, cnt_ref):
    # xyz_ref (1, N, 3) points; q_ref (1, BM, 3) queries
    pts = xyz_ref[0]                                   # (N, 3)
    q = q_ref[0]                                       # (BM, 3)
    N = pts.shape[0]
    BM = q.shape[0]

    inner = jnp.dot(q, pts.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (BM, N) on the MXU
    d2 = (jnp.sum(q * q, -1, keepdims=True)
          + jnp.sum(pts * pts, -1)[None, :] - 2.0 * inner)
    lane = lax.broadcasted_iota(jnp.int32, (BM, N), 1)
    valid = lane < n_valid
    hit = (d2 < radius * radius) & valid

    BIG = 2 * N
    key0 = jnp.where(hit, lane, jnp.where(valid, lane + N, BIG))
    cnt = jnp.minimum(jnp.sum(hit, -1), nsample).astype(jnp.int32)
    # cnt output is (1, 8, BM): sublane dim padded to the f32/i32 tile
    # minimum (Mosaic requires block dims (8, 128)-aligned)
    cnt_ref[0, :, :] = jnp.broadcast_to(cnt[None, :], (8, BM))

    col = lax.broadcasted_iota(jnp.int32, (BM, nsample), 1)

    def body(s, carry):
        key, out = carry
        cur = jnp.min(key, axis=-1)                    # (BM,) smallest index
        taken = lane == cur[:, None]
        key = jnp.where(taken, BIG, key)
        out = jnp.where(col == s, cur[:, None], out)
        return key, out

    out0 = jnp.zeros((BM, nsample), jnp.int32)
    _, out = lax.fori_loop(0, nsample, body, (key0, out0))

    is_hit = out < N
    raw = jnp.where(is_hit, out, jnp.where(out < BIG, out - N, 0))
    first = raw[:, :1]                                 # first hit (or first miss)
    idx_ref[0, :, :] = jnp.where(is_hit, raw, first)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def query_ball_point_pallas(radius: float, nsample: int, xyz: jax.Array,
                            new_xyz: jax.Array, interpret: bool = False):
    """xyz (B, N, 3), new_xyz (B, M, 3) -> (idx (B, M, nsample) int32,
    cnt (B, M) int32).  Exact ops.core.query_ball_point semantics."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_pad = -(-N // 128) * 128
    m_pad = -(-M // 128) * 128
    x = xyz.astype(jnp.float32)
    q = new_xyz.astype(jnp.float32)
    if n_pad != N:
        # pad with far-away points so they never hit
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)),
                    constant_values=1e9)
    if m_pad != M:
        q = jnp.pad(q, ((0, 0), (0, m_pad - M), (0, 0)))

    idx, cnt = pl.pallas_call(
        functools.partial(_ballq_kernel, radius, nsample, N),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m_pad, nsample), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
        ),
        interpret=interpret,
    )(x, q)
    return idx[:, :M], cnt[:, 0, :M]
