"""Pallas TPU kernel: streaming (blockwise-candidates) 3-NN search.

Large-cloud variant of ops/pallas/three_nn.py: the candidate set is
tiled along M by the grid and a running best-3 state (squared distance +
global index per query) lives in VMEM scratch across the sequential
M-tiles, so candidate sets far larger than VMEM stream through at a
fixed working-set size.  Queries are tiled independently (they are
embarrassingly parallel).

Semantics match ops.core.three_nn exactly: SQUARED distances ascending,
ties to the lowest global index (the merge key is (distance, index)
lexicographic, so cross-tile ties resolve identically to a full scan).

Reference: tf_ops/3d_interpolation/tf_interpolate.cpp:60-102 (CPU-only
upstream — the capability this stream kernel adds, arbitrary-M on
device, has no reference analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(m_valid: int, block_m: int,
            q_ref, p_ref, dist_ref, idx_ref, dstate, istate):
    mb = pl.program_id(2)
    m_tiles = pl.num_programs(2)
    q = q_ref[0]                                       # (NB, 3)
    p = p_ref[0]                                       # (MB, 3)
    NB = q.shape[0]
    MB = p.shape[0]

    @pl.when(mb == 0)
    def _init():
        dstate[:, :] = jnp.full((NB, 8), jnp.inf, jnp.float32)
        istate[:, :] = jnp.zeros((NB, 8), jnp.int32)

    inner = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (NB, MB)
    d2 = jnp.maximum(
        jnp.sum(q * q, -1, keepdims=True)
        + jnp.sum(p * p, -1)[None, :] - 2.0 * inner, 0.0)
    lane = lax.broadcasted_iota(jnp.int32, (NB, MB), 1)
    g_idx = mb * block_m + lane
    d2 = jnp.where(g_idx < m_valid, d2, jnp.inf)

    # tile-local best 3 (ascending, ties to lowest index)
    col8 = lax.broadcasted_iota(jnp.int32, (NB, 8), 1)
    tile_d = jnp.full((NB, 8), jnp.inf, jnp.float32)
    tile_i = jnp.zeros((NB, 8), jnp.int32)
    d = d2
    for k in range(3):
        v = jnp.min(d, axis=-1)
        i = jnp.min(jnp.where(d == v[:, None], lane, MB), axis=-1)
        tile_d = jnp.where(col8 == k, v[:, None], tile_d)
        tile_i = jnp.where(col8 == k, (mb * block_m + i)[:, None], tile_i)
        d = jnp.where(lane == i[:, None], jnp.inf, d)

    # merge: 3 state + 3 tile candidates live in lanes 0-2 / 4-6 of an
    # (NB, 8) plane; select the 3 smallest by (distance, index)
    cand_d = jnp.where(col8 < 3, dstate[:, :],
                       jnp.where((col8 >= 4) & (col8 < 7),
                                 jnp.roll(tile_d, 4, axis=1), jnp.inf))
    cand_i = jnp.where(col8 < 3, istate[:, :],
                       jnp.where((col8 >= 4) & (col8 < 7),
                                 jnp.roll(tile_i, 4, axis=1), 0))
    new_d = jnp.full((NB, 8), jnp.inf, jnp.float32)
    new_i = jnp.zeros((NB, 8), jnp.int32)
    d_work = cand_d
    for k in range(3):
        v = jnp.min(d_work, axis=-1)
        # among equal-distance candidates prefer the lowest global index
        sel_i = jnp.min(jnp.where(d_work == v[:, None], cand_i, 2**30),
                        axis=-1)
        taken = (d_work == v[:, None]) & (cand_i == sel_i[:, None])
        d_work = jnp.where(taken, jnp.inf, d_work)
        new_d = jnp.where(col8 == k, v[:, None], new_d)
        new_i = jnp.where(col8 == k, sel_i[:, None], new_i)
    dstate[:, :] = new_d
    istate[:, :] = new_i

    @pl.when(mb == m_tiles - 1)
    def _finalize():
        dist_ref[0, :, :] = new_d
        idx_ref[0, :, :] = new_i


@functools.partial(jax.jit, static_argnums=(2, 3))
def three_nn_stream(xyz1: jax.Array, xyz2: jax.Array,
                    block_m: int = 2048, interpret: bool = False):
    """xyz1 (B, N, 3), xyz2 (B, M, 3) -> (dist (B, N, 3) squared asc,
    idx (B, N, 3) int32); VMEM working set O(NB · block_m), independent
    of M."""
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    block_m = min(block_m, -(-M // 128) * 128)
    m_pad = -(-M // block_m) * block_m
    q = xyz1.astype(jnp.float32)
    p = xyz2.astype(jnp.float32)
    if m_pad != M:
        p = jnp.pad(p, ((0, 0), (0, m_pad - M), (0, 0)))
    # query-tile size bounded by the (NB, block_m) tile + intermediates
    NB = max(128, (2 * 1024 * 1024 // (block_m * 4)) // 128 * 128)
    n_pad = -(-N // NB) * NB
    if n_pad != N:
        q = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0)))
    n_tiles = n_pad // NB
    m_tiles = m_pad // block_m

    dist, idx = pl.pallas_call(
        functools.partial(_kernel, M, block_m),
        grid=(B, n_tiles, m_tiles),
        in_specs=[
            pl.BlockSpec((1, NB, 3), lambda b, n, m: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 3), lambda b, n, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NB, 8), lambda b, n, m: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 8), lambda b, n, m: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, 8), jnp.float32),
            pltpu.VMEM((NB, 8), jnp.int32),
        ],
        interpret=interpret,
    )(q, p)
    return dist[:, :N, :3], idx[:, :N, :3]
