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
