"""Pallas TPU kernel: farthest point sampling.

The TPU-native counterpart of the reference CUDA kernel
(reference: tf_ops/sampling/tf_sampling_g.cu:105-170), which kept a
running min-distance array in shared memory with a block-wide
max-reduction per step.  Here the same recurrence runs entirely in VMEM:

- points live as (BB, 3, N) coordinate planes so N is the lane axis,
- the min-distance state (BB, N) stays VMEM-resident across all m steps
  (no HBM round-trips inside the loop),
- the selected point's coordinates are extracted with a one-hot
  lane-mask reduction (no dynamic lane indexing),
- each step is pure VPU work batched over the BB rows in the block;
  the grid tiles the batch so arbitrary B fits in VMEM.

Semantics match ops.core.farthest_point_sample / the CUDA kernel
exactly: first pick is index 0, squared-distance metric, ties take the
lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, n_valid: int, xyz_ref, out_ref):
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    BB, N = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    valid = lane < n_valid
    col = lax.broadcasted_iota(jnp.int32, (BB, npoint), 1)

    def body(j, carry):
        mind, last, picks = carry
        onehot = (lane == last[:, None]).astype(x.dtype)
        lx = jnp.sum(x * onehot, axis=-1, keepdims=True)
        ly = jnp.sum(y * onehot, axis=-1, keepdims=True)
        lz = jnp.sum(z * onehot, axis=-1, keepdims=True)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        mind = jnp.minimum(mind, d)
        masked = jnp.where(valid, mind, -1.0)
        # argmax with lowest-index ties, written as max + min-index
        # reduce: jnp.argmax's Mosaic lowering fails to legalize when N
        # is a single 128-lane tile (f32->i32 materialization error)
        best = jnp.max(masked, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(masked == best, lane, jnp.int32(2**30)),
                      axis=-1).astype(jnp.int32)
        # lane-masked accumulate (dynamic single-column vector stores
        # don't lower on TPU; a select over the (BB, npoint) plane does)
        picks = jnp.where(col == j, nxt[:, None], picks)
        return mind, nxt, picks

    init = (jnp.full((BB, N), 1e38, x.dtype),
            jnp.zeros((BB,), jnp.int32),
            jnp.zeros((BB, npoint), jnp.int32))
    _, _, picks = lax.fori_loop(1, npoint, body, init)
    out_ref[:, :] = picks


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def farthest_point_sample_pallas(npoint: int, xyz: jax.Array,
                                 block_b: int = 0,
                                 interpret: bool = False) -> jax.Array:
    """xyz (B, N, 3) -> (B, npoint) int32, Pallas VMEM-resident FPS.

    block_b: batch rows per grid step; 0 (default) auto-sizes so the
    VMEM working set (3 coordinate planes + the min-distance state +
    ~2 working planes per row) stays under ~8 MB — the large-cloud tier:
    N=32k runs at block_b=8 where the old fixed block_b=64 needed ~33 MB
    and could not fit VMEM (SURVEY §5 "blockwise" plan; the O(N)
    min-distance carry itself is unavoidable — it is the same recurrence
    as the CUDA kernel, tf_sampling_g.cu:105-170).

    `interpret=True` runs the kernel in the Pallas interpreter (CPU
    testing).  Tie behavior may differ from ops.core by one f32 ulp —
    both satisfy the FPS invariant (see tests/test_pallas.py).
    """
    B, N, _ = xyz.shape
    n_pad = -(-N // 128) * 128
    if block_b <= 0:
        budget = 8 * 2**20
        block_b = max(1, min(64, budget // (6 * n_pad * 4)))
    if n_pad * 6 * 4 > 14 * 2**20:
        raise ValueError(
            f"farthest_point_sample_pallas: N={N} needs ~{n_pad * 24 >> 20} MB "
            "VMEM per batch row (> the ~14 MB budget even at block_b=1); "
            "use ops.core.farthest_point_sample (XLA) for clouds this large")
    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if n_pad != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - N)))
    bb = min(block_b, B)
    b_pad = -(-B // bb) * bb
    if b_pad != B:
        planes = jnp.pad(planes, ((0, b_pad - B), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint, N),
        grid=(b_pad // bb,),
        in_specs=[pl.BlockSpec((bb, 3, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, npoint), jnp.int32),
        interpret=interpret,
    )(planes)
    return out[:B]


def _fps2_kernel(np1: int, np2: int, n_valid: int, xyz_ref,
                 idx1_ref, xyz1_ref, idx2_ref, xyz2_ref):
    """Two FPS levels in one kernel: N -> np1 -> np2.

    Phase 1 runs the standard recurrence AND captures each pick's
    coordinates into VMEM (BB, np1) planes; phase 2 then runs the same
    recurrence directly on those planes — the intermediate cloud never
    leaves VMEM and the host-side gather_point between levels
    disappears.  idx2 indexes into the np1-subset (the same local
    indexing the backbone's second SA stage uses).
    """
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    BB, N = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    valid = lane < n_valid
    col1 = lax.broadcasted_iota(jnp.int32, (BB, np1), 1)

    def extract(xs, onehot):
        return [jnp.sum(v * onehot, axis=-1, keepdims=True) for v in xs]

    def body1(j, carry):
        mind, last, picks, sel = carry
        onehot = (lane == last[:, None]).astype(x.dtype)
        lx, ly, lz = extract((x, y, z), onehot)
        # store pick j-1's coords at column j-1
        at = col1 == (j - 1)
        sel = [jnp.where(at, c, s) for s, c in zip(sel, (lx, ly, lz))]
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        mind = jnp.minimum(mind, d)
        masked = jnp.where(valid, mind, -1.0)
        best = jnp.max(masked, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(masked == best, lane, jnp.int32(2**30)),
                      axis=-1).astype(jnp.int32)
        picks = jnp.where(col1 == j, nxt[:, None], picks)
        return mind, nxt, picks, sel

    zero1 = jnp.zeros((BB, np1), x.dtype)
    init = (jnp.full((BB, N), 1e38, x.dtype), jnp.zeros((BB,), jnp.int32),
            jnp.zeros((BB, np1), jnp.int32), [zero1, zero1, zero1])
    mind, last, picks1, sel = lax.fori_loop(1, np1, body1, init)
    # final pick's coords
    onehot = (lane == last[:, None]).astype(x.dtype)
    lx, ly, lz = extract((x, y, z), onehot)
    at = col1 == (np1 - 1)
    sx, sy, sz = [jnp.where(at, c, s) for s, c in zip(sel, (lx, ly, lz))]

    idx1_ref[:, :] = picks1
    xyz1_ref[:, 0, :] = sx
    xyz1_ref[:, 1, :] = sy
    xyz1_ref[:, 2, :] = sz

    # ---- phase 2 on the VMEM-resident subset --------------------------
    lane2 = lax.broadcasted_iota(jnp.int32, (BB, np1), 1)
    col2 = lax.broadcasted_iota(jnp.int32, (BB, np2), 1)

    def body2(j, carry):
        mind, last, picks, sel = carry
        onehot = (lane2 == last[:, None]).astype(x.dtype)
        lx, ly, lz = extract((sx, sy, sz), onehot)
        at = col2 == (j - 1)
        sel = [jnp.where(at, c, s) for s, c in zip(sel, (lx, ly, lz))]
        d = (sx - lx) ** 2 + (sy - ly) ** 2 + (sz - lz) ** 2
        mind = jnp.minimum(mind, d)
        best = jnp.max(mind, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(mind == best, lane2, jnp.int32(2**30)),
                      axis=-1).astype(jnp.int32)
        picks = jnp.where(col2 == j, nxt[:, None], picks)
        return mind, nxt, picks, sel

    zero2 = jnp.zeros((BB, np2), x.dtype)
    init2 = (jnp.full((BB, np1), 1e38, x.dtype), jnp.zeros((BB,), jnp.int32),
             jnp.zeros((BB, np2), jnp.int32), [zero2, zero2, zero2])
    mind2, last2, picks2, sel2 = lax.fori_loop(1, np2, body2, init2)
    onehot = (lane2 == last2[:, None]).astype(x.dtype)
    lx, ly, lz = extract((sx, sy, sz), onehot)
    at = col2 == (np2 - 1)
    s2 = [jnp.where(at, c, s) for s, c in zip(sel2, (lx, ly, lz))]

    idx2_ref[:, :] = picks2
    xyz2_ref[:, 0, :] = s2[0]
    xyz2_ref[:, 1, :] = s2[1]
    xyz2_ref[:, 2, :] = s2[2]


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def farthest_point_sample2_pallas(np1: int, np2: int, xyz: jax.Array,
                                  block_b: int = 0,
                                  interpret: bool = False):
    """Fused two-level FPS: xyz (B, N, 3) ->
    (idx1 (B, np1) i32, xyz1 (B, np1, 3), idx2 (B, np2) i32 — LOCAL
    indices into the np1 subset — and xyz2 (B, np2, 3)).

    Semantics match farthest_point_sample_pallas applied twice with a
    gather in between (the backbone's SA1 -> SA2 pattern); the subset
    stays VMEM-resident between the levels and the coordinate gathers
    ride the pick loop's existing one-hot extraction.
    """
    B, N, _ = xyz.shape
    n_pad = -(-N // 128) * 128
    if block_b <= 0:
        budget = 8 * 2**20
        block_b = max(1, min(64, budget // (6 * n_pad * 4)))
    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if n_pad != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - N)))
    bb = min(block_b, B)
    b_pad = -(-B // bb) * bb
    if b_pad != B:
        planes = jnp.pad(planes, ((0, b_pad - B), (0, 0), (0, 0)))

    idx1, xyz1, idx2, xyz2 = pl.pallas_call(
        functools.partial(_fps2_kernel, np1, np2, N),
        grid=(b_pad // bb,),
        in_specs=[pl.BlockSpec((bb, 3, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bb, np1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 3, np1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, np2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 3, np2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, np1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 3, np1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, np2), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 3, np2), jnp.float32),
        ),
        interpret=interpret,
    )(planes)
    return (idx1[:B], jnp.transpose(xyz1, (0, 2, 1))[:B],
            idx2[:B], jnp.transpose(xyz2, (0, 2, 1))[:B])
