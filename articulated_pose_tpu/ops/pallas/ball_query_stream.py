"""Pallas TPU kernel: streaming (blockwise-N) ball query.

Large-cloud variant of ops/pallas/ball_query.py: instead of holding the
full (M, N) distance tile in VMEM, the point set is tiled along N by the
grid; per-query selection state (output slots + hit counts) lives in the
revisited output blocks and persists across N-tiles, so clouds far
larger than VMEM stream through at a fixed working-set size.

Layout note: coordinates travel as (8, N) planes (x/y/z in rows 0-2,
rest zero) — an (N, 3) array in VMEM pads its last dim to 128 lanes and
wastes 40× the memory; the plane layout stores N on the lane axis and
feeds the (M, 8) × (8, NB) distance matmul directly.

Semantics remain exactly the reference CUDA kernel's
(tf_grouping_g.cu:3-36): first `nsample` hits in global index order
(tiles arrive in index order, so per-tile in-order extraction preserves
the global order), all slots pre-filled with the first hit, counts
capped at nsample.  vs ops.core the only divergence is f32 rounding on
points within ~1e-6 of the radius boundary (the kernel's d² summation
order differs; ~2x faster than the XLA path at N=32k in same-window
comparisons, where the XLA (B, M, N) tile is 256 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(radius: float, nsample: int, n_valid: int, block_n: int,
            xyz_ref, q_ref, idx_ref, cnt_ref, out_state, cnt_state):
    """Rank-based per-tile selection (see ops/pallas/ball_query.py).

    Each hit's global output slot = hits-before-it-in-earlier-tiles
    (cnt_state) + within-tile exclusive rank (chunked triangular matmuls
    on the MXU).  Extraction is one compare+masked-sum pass per slot
    ACCUMULATED into out_state: every slot is produced by exactly one
    tile (slot ranges are disjoint across tiles), so the running sum is
    exact — no key-plane write-backs, no per-slot sequential min loop.
    """
    nb = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    pp = xyz_ref[0]                                     # (8, NB) planes
    qp = q_ref[0]                                       # (8, M) planes
    NB = pp.shape[1]
    M = qp.shape[1]

    # selection state lives in VMEM scratch (persists across the grid's
    # sequential N-tiles; reading back output refs mid-grid miscompiles)
    @pl.when(nb == 0)
    def _init():
        out_state[:, :] = jnp.zeros((M, nsample), jnp.float32)
        cnt_state[:, :] = jnp.zeros((8, M), jnp.float32)

    # (M, 8) @ (8, NB) on the MXU; zero rows contribute nothing
    inner = jnp.dot(qp.T, pp, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)    # (M, NB)
    p2 = jnp.sum(pp * pp, axis=0)[None, :]              # (1, NB)
    q2 = jnp.sum(qp * qp, axis=0)[:, None]              # (M, 1)
    d2 = q2 + p2 - 2.0 * inner
    lane = lax.broadcasted_iota(jnp.int32, (M, NB), 1)
    g_idx = nb * block_n + lane
    hit = (d2 < radius * radius) & (g_idx < n_valid)
    hitf = hit.astype(jnp.float32)

    CH = 256 if NB % 256 == 0 else 128
    ii = lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    jj = lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    U = (ii < jj).astype(jnp.float32)

    # cnt_state rows: [0] hits so far (uncapped), [1] first hit lane
    # (or BIGF), rest padding
    prev_cnt = cnt_state[0, :]                          # (M,) f32
    BIGF = jnp.float32(2**30)
    prev_first = jnp.where(nb == 0, BIGF, cnt_state[1, :])

    off = prev_cnt[:, None]
    slots = []
    for k in range(NB // CH):
        h = hitf[:, k * CH:(k + 1) * CH]
        rank = jnp.dot(h, U, preferred_element_type=jnp.float32)
        slots.append(jnp.where(hit[:, k * CH:(k + 1) * CH],
                               rank + off, -1.0))
        off = off + (rank[:, -1:] + h[:, -1:])
    slot_sel = jnp.concatenate(slots, axis=1)           # (M, NB)
    g_lanef = g_idx.astype(jnp.float32)

    col = lax.broadcasted_iota(jnp.int32, (M, nsample), 1)
    out = out_state[:, :]
    GROUP = 4 if nsample % 4 == 0 else 1

    def body(g, out):
        s0 = g * GROUP
        for d in range(GROUP):
            s = s0 + d
            val = jnp.sum(jnp.where(slot_sel == s.astype(jnp.float32),
                                    g_lanef, 0.0), axis=-1)
            out = out + jnp.where(col == s, val[:, None], 0.0)
        return out

    out = lax.fori_loop(0, nsample // GROUP, body, out)
    out_state[:, :] = out

    tile_first = jnp.min(jnp.where(hit, g_lanef, BIGF), axis=-1)
    first = jnp.minimum(prev_first, tile_first)
    cnt_new = off[:, 0]
    cnt_plane = jnp.where(
        lax.broadcasted_iota(jnp.int32, (8, M), 0) == 1,
        first[None, :], jnp.broadcast_to(cnt_new[None, :], (8, M)))
    cnt_state[:, :] = cnt_plane

    @pl.when(nb == n_blocks - 1)
    def _finalize():
        cnt = jnp.minimum(cnt_new, float(nsample)).astype(jnp.int32)
        first_or_zero = jnp.where(first < BIGF, first, 0.0)[:, None]
        # pad unfilled slots with the first hit (tf_grouping_g.cu:26-28)
        idx_ref[0, :, :] = jnp.where(col < cnt[:, None], out,
                                     first_or_zero).astype(jnp.int32)
        cnt_ref[0, :, :] = jnp.broadcast_to(cnt[None, :], (8, M))


def _to_planes(a: jax.Array, pad_to: int, pad_value: float = 0.0) -> jax.Array:
    """(B, N, 3) -> (B, 8, pad_to) coordinate planes.

    Tail LANES (points beyond N) get pad_value so padded points sit far
    away; the 5 filler sublane ROWS stay zero so they contribute nothing
    to p² or the inner product.
    """
    B, N, _ = a.shape
    planes = jnp.transpose(a.astype(jnp.float32), (0, 2, 1))   # (B, 3, N)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad_to - N)),
                     constant_values=pad_value)
    return jnp.pad(planes, ((0, 0), (0, 5), (0, 0)))


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def query_ball_point_stream(radius: float, nsample: int, xyz: jax.Array,
                            new_xyz: jax.Array, block_n: int = 2048,
                            interpret: bool = False):
    """Streaming ball query for large N (< 2^24; f32-carried indices).

    xyz (B, N, 3), new_xyz (B, M, 3) -> (idx (B, M, nsample) int32,
    cnt (B, M) int32).  VMEM working set is O(M · block_n), independent
    of N.  `block_n` is an upper-bound hint: it is clamped so the
    kernel's live (M, block_n) f32 intermediates (d², slot selection)
    fit the ~16 MB scoped-VMEM stack (measured on v5e: 2 live planes at
    M=512, block_n=4096 allocate 17.08 MB and are rejected).
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    if N >= 2**24:
        # point indices and running counts are carried as f32 inside the
        # kernel (exact integers only below 2^24) — fail loudly instead
        # of returning silently corrupted indices
        raise ValueError(
            f"query_ball_point_stream: N={N} exceeds the f32 exact-integer "
            "index range (2^24); split the cloud or extend the kernel to "
            "carry i32 indices")
    m_pad = -(-M // 128) * 128
    # keep ~2 live (m_pad, block_n) f32 planes under the 16 MB scoped
    # stack with margin (<= 12 MB)
    max_elems = 1_500_000
    if m_pad * block_n > max_elems:
        block_n = max(128, (max_elems // m_pad) // 128 * 128)
    block_n = min(block_n, -(-N // 128) * 128)
    n_pad = -(-N // block_n) * block_n
    x = _to_planes(xyz, n_pad, pad_value=1e9)
    q = _to_planes(new_xyz, m_pad)
    n_blocks = n_pad // block_n

    idx, cnt = pl.pallas_call(
        functools.partial(_kernel, radius, nsample, N, block_n),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 8, block_n), lambda b, nb: (b, 0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, nb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m_pad, nsample), lambda b, nb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, nb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m_pad, nsample), jnp.float32),
            pltpu.VMEM((8, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x, q)
    return idx[:, :M], cnt[:, 0, :M]
