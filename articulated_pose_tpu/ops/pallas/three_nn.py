"""Pallas TPU kernel: fused 3-nearest-neighbor search.

TPU-native counterpart of the reference CPU op (reference:
tf_ops/3d_interpolation/tf_interpolate.cpp:60-102 — which forced a
GPU→CPU→GPU round-trip every FP stage).  The XLA path
(ops/core.py::three_nn) computes the (B, N, M) distance tile in HBM and
re-reads it for each of three masked arg-min sweeps; here the tile is
computed on the MXU and swept entirely in VMEM, tiled over (batch,
query-blocks) to fit the ~16 MB scoped-VMEM limit (the untiled version
both OOM'd VMEM and stalled the compiler for >25 min).  Measured 3.1 vs
4.3 ms for the XLA sweeps at the FP1 shape (B=64, N=2048, M=512, v5e),
exact parity on TPU; production default via BackboneSpec.three_nn_impl.

Semantics match ops.core.three_nn exactly: SQUARED distances, ascending,
ties to the lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _three_nn_kernel(m_valid: int, xyz1_ref, xyz2_ref, dist_ref, idx_ref):
    # xyz1_ref (1, N, 3) queries; xyz2_ref (1, M, 3) candidates
    q = xyz1_ref[0]                                    # (N, 3)
    p = xyz2_ref[0]                                    # (M, 3)
    N = q.shape[0]
    M = p.shape[0]

    inner = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (N, M) on the MXU
    d2 = jnp.maximum(
        jnp.sum(q * q, -1, keepdims=True)
        + jnp.sum(p * p, -1)[None, :] - 2.0 * inner, 0.0)
    lane = lax.broadcasted_iota(jnp.int32, (N, M), 1)
    d2 = jnp.where(lane < m_valid, d2, jnp.inf)

    d = d2
    for k in range(3):
        v = jnp.min(d, axis=-1)                        # (N,)
        i = jnp.min(jnp.where(d == v[:, None], lane, M), axis=-1)
        # per-slot column writes (minor dims stay lane-tile aligned)
        col = lax.broadcasted_iota(jnp.int32, (N, 8), 1)
        if k == 0:
            dist_acc = jnp.where(col == 0, v[:, None], 0.0)
            idx_acc = jnp.where(col == 0, i[:, None], 0)
        else:
            dist_acc = jnp.where(col == k, v[:, None], dist_acc)
            idx_acc = jnp.where(col == k, i[:, None], idx_acc)
        d = jnp.where(lane == i[:, None], jnp.inf, d)

    dist_ref[0, :, :] = dist_acc
    idx_ref[0, :, :] = idx_acc


def _three_nn_key_kernel(m_valid: int, xyz1_ref, xyz2_ref, dist_ref, idx_ref):
    """Packed-key variant: one i32 sort key per (query, candidate).

    key = (f32 bits of d2, truncated to the top 16) | lane.  d2 >= 0 so
    the f32 bit pattern is monotone as an i32; truncation keeps 7
    mantissa bits (bf16-grade, <= 2^-8 relative), and the lane in the
    low 16 bits makes ties resolve to the lowest index — the exact
    kernel's semantics.  Each of the 3 sweeps is then ONE min + ONE
    masked update over the (N, M) tile instead of the exact kernel's
    min + equality-scan + arg-extract + update (~2 passes vs ~4).

    Cost: the selection ORDER is by truncated distance, so two
    candidates whose d2 agree to 2^-8 relative may swap vs the exact
    kernel, and the emitted dist is the truncated d2 (always <= exact).
    Inference tier only — A/B evidence in docs/perf_round3.md.
    """
    q = xyz1_ref[0]                                    # (N, 3)
    p = xyz2_ref[0]                                    # (M, 3)
    N = q.shape[0]
    M = p.shape[0]

    inner = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (N, M) on the MXU
    d2 = jnp.maximum(
        jnp.sum(q * q, -1, keepdims=True)
        + jnp.sum(p * p, -1)[None, :] - 2.0 * inner, 0.0)
    lane = lax.broadcasted_iota(jnp.int32, (N, M), 1)
    bits = lax.bitcast_convert_type(d2, jnp.int32)
    key = jnp.where(lane < m_valid,
                    (bits & jnp.int32(-65536)) | lane, jnp.int32(2**31 - 1))

    for k in range(3):
        v = jnp.min(key, axis=-1)                      # (N,) i32
        i = v & jnp.int32(0xFFFF)
        dk = lax.bitcast_convert_type(v & jnp.int32(-65536), jnp.float32)
        col = lax.broadcasted_iota(jnp.int32, (N, 8), 1)
        if k == 0:
            dist_acc = jnp.where(col == 0, dk[:, None], 0.0)
            idx_acc = jnp.where(col == 0, i[:, None], 0)
        else:
            dist_acc = jnp.where(col == k, dk[:, None], dist_acc)
            idx_acc = jnp.where(col == k, i[:, None], idx_acc)
        key = jnp.where(lane == i[:, None], jnp.int32(2**31 - 1), key)

    dist_ref[0, :, :] = dist_acc
    idx_ref[0, :, :] = idx_acc


@functools.partial(jax.jit, static_argnums=(2, 3))
def three_nn_pallas(xyz1: jax.Array, xyz2: jax.Array,
                    interpret: bool = False, packed: bool = False):
    """xyz1 (B, N, 3), xyz2 (B, M, 3) -> (dist (B, N, 3) squared asc,
    idx (B, N, 3) int32).  Exact ops.core.three_nn semantics.

    packed=True swaps in the i32 sort-key kernel (_three_nn_key_kernel):
    ~half the sweep passes, distances truncated to bf16-grade (<= 2^-8
    relative, always <= exact); near-ties within the truncation may pick
    a different (equally close) neighbor.  Inference tier."""
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    n_pad = -(-N // 128) * 128
    m_pad = -(-M // 128) * 128
    q = xyz1.astype(jnp.float32)
    p = xyz2.astype(jnp.float32)
    if n_pad != N:
        q = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0)))
    if m_pad != M:
        # padded candidates masked out by m_valid inside the kernel
        p = jnp.pad(p, ((0, 0), (0, m_pad - M), (0, 0)))

    # tile the query axis: the (NB, M) distance tile plus its sweep
    # intermediates (~4x the tile) must stay under the ~16 MB scoped-VMEM
    # limit, so budget ~2 MB for the tile itself
    NB = min(n_pad, max(128, (2 * 1024 * 1024 // (m_pad * 4)) // 128 * 128))
    n_tiles = -(-n_pad // NB)
    if n_pad % NB:
        q = jnp.pad(q, ((0, 0), (0, n_tiles * NB - n_pad), (0, 0)))

    if packed:
        assert m_pad <= 65536, "packed key holds the lane in 16 bits"
    kern = _three_nn_key_kernel if packed else _three_nn_kernel
    dist, idx = pl.pallas_call(
        functools.partial(kern, M),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, NB, 3), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 3), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NB, 8), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 8), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_tiles * NB, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles * NB, 8), jnp.int32),
        ),
        interpret=interpret,
    )(q, p)
    return dist[:, :N, :3], idx[:, :N, :3]
