"""Pallas TPU kernel: bucket-sampled ball query + grouped coords via MXU.

Inference-tier counterpart of the butterfly kernel
(ops/pallas/ball_query_butterfly.py) that replaces the log2(N)
roll+select routing network with ONE matmul per output plane:

- output slot j is bound to the j-th contiguous bucket of W = N/nsample
  lanes, and selects that bucket's FIRST in-radius point (5-stage
  prefix-OR within buckets marks it — ~15 VPU ops/element vs ~130 for
  the butterfly),
- because each bucket contributes at most one selected lane, extracting
  every slot is a SEGMENT SUM: (BM, N) masked plane @ (N, nsample) 0/1
  bucket matrix on the MXU — selection-by-matmul instead of
  selection-by-routing,
- unfilled slots are backfilled with the first filled slot's value by a
  log2(nsample)-stage propagation over the tiny (BM, nsample) output,
  mirroring the CUDA first-hit padding (tf_grouping_g.cu:17-31); zero
  hits fall back to point 0, as there.

Semantics vs the exact kernel (the reference's "first nsample hits in
index order", tf_grouping_g.cu:3-36): every returned point is a true
in-radius hit and `cnt` is exact, but the SUBSET differs when a bucket
holds more than one hit — one hit per bucket, quasi-uniform over the
index range, instead of the first-64 prefix.  The consuming PointConv
max-pools over the slots, so subset choice is a sampling detail; the
index-order prefix the CUDA kernel returns is itself an arbitrary
subset.  Grouped coordinates are centered IN the kernel and pass
through one bf16 matmul, so they carry bf16-grade rounding
(<= 2^-8 relative on the centered offsets, i.e. <= radius/256) — the
same grade the downstream bf16 PointConv applies to them anyway.  idx
rides an f32 matmul at HIGHEST precision (fp32 contract — exact for
the <= 2^11 integer lane ids).  Training keeps the exact butterfly
tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_right(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    if interpret:
        return jnp.roll(x, shift, axis=-1)
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _ballq_bucket_kernel(radius: float, nsample: int, n_valid: int,
                         emit_idx: bool, interpret: bool,
                         xyz_ref, q_ref, *out_refs):
    pts = xyz_ref[0]                                   # (N, 3) f32
    q = q_ref[0]                                       # (BM, 3) f32
    N = pts.shape[0]
    BM = q.shape[0]
    W = N // nsample                                   # bucket width (pow2)
    w_log2 = W.bit_length() - 1

    inner = jnp.dot(q, pts.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (BM, N) on the MXU
    d2 = (jnp.sum(q * q, -1, keepdims=True)
          + jnp.sum(pts * pts, -1)[None, :] - 2.0 * inner)
    lane = lax.broadcasted_iota(jnp.int32, (BM, N), 1)
    hit = (d2 < radius * radius) & (lane < n_valid)
    cnt = jnp.minimum(jnp.sum(hit, -1), nsample).astype(jnp.int32)

    # ---- first hit per W-lane bucket: prefix-OR (Hillis-Steele) ------
    # masks ride as i32 0/1 planes — Mosaic cannot dynamic_rotate an i1
    # vector (compile-time crash), so booleans never touch a roll
    lmod = lane & (W - 1)
    seen = hit.astype(jnp.int32)     # OR of bucket hits at or before lane
    k = 1
    while k < W:
        seen = seen | jnp.where(lmod >= k,
                                _roll_right(seen, k, interpret), 0)
        k *= 2
    earlier = jnp.where(lmod >= 1, _roll_right(seen, 1, interpret), 0)
    selected = hit & (earlier == 0)                    # <=1 per bucket

    # ---- slot extraction: segment-sum matmuls on the MXU -------------
    # S[n, j] = [n // W == j]; one selected lane per bucket makes the
    # "sum" a selection.  Coord planes are CENTERED before the matmul so
    # bf16 rounding applies to the small offsets (<= radius), not the
    # raw coordinates.
    S = ((lax.broadcasted_iota(jnp.int32, (N, nsample), 0) >> w_log2)
         == lax.broadcasted_iota(jnp.int32, (N, nsample), 1))
    Sb = S.astype(jnp.bfloat16)
    planes = [jnp.where(selected,
                        pts[:, c][None, :] - q[:, c][:, None],
                        0.0).astype(jnp.bfloat16) for c in range(3)]
    planes.append(selected.astype(jnp.bfloat16))       # filled marker
    vs = [jnp.dot(p, Sb, preferred_element_type=jnp.float32)
          for p in planes]                             # (BM, nsample)
    filled = vs[3] > 0.5
    vs = vs[:3]
    if emit_idx:
        # exact integers: f32 plane through an fp32-contract matmul
        # (Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST
        # keeps the <= 2^11 integers exact)
        pli = jnp.where(selected, (lane + 1).astype(jnp.float32), 0.0)
        vs.append(jnp.dot(pli, S.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST))

    # ---- backfill: first filled slot's value to every unfilled slot --
    col = lax.broadcasted_iota(jnp.int32, (BM, nsample), 1)
    vf = filled.astype(jnp.int32)          # i32 mask: see prefix-OR note

    def _roll_left_slots(x, k):
        if interpret:
            return jnp.roll(x, -k, axis=-1)
        return pltpu.roll(x, nsample - k, axis=x.ndim - 1)

    k = 1
    while k < nsample:
        sf = jnp.where(col + k < nsample, _roll_left_slots(vf, k), 0)
        take = (vf == 0) & (sf != 0)
        vs = [jnp.where(take, _roll_left_slots(v, k), v) for v in vs]
        vf = vf | sf
        k *= 2
    any_hit = cnt[:, None] > 0

    out_i = 0
    for c in range(3):
        # zero hits -> point 0 (centered), as the CUDA kernel
        fallback = pts[0, c] - q[:, c][:, None]
        out_refs[out_i][0, :, :] = jnp.where(
            filled, vs[c], jnp.where(any_hit, vs[c][:, 0:1], fallback))
        out_i += 1
    # cnt rides the same (bm, nsample) block layout as the coord planes
    # (a dedicated (8, bm) block violates Mosaic's last-dim rule once the
    # VMEM auto-shrink drops bm below 128); column 0 is read outside
    out_refs[out_i][0, :, :] = jnp.broadcast_to(cnt[:, None], (BM, nsample))
    out_i += 1
    if emit_idx:
        vi = vs[3]
        vi = jnp.where(filled, vi, jnp.where(any_hit, vi[:, 0:1], 1.0))
        out_refs[out_i][0, :, :] = vi.astype(jnp.int32) - 1


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def query_ball_group_bucket(radius: float, nsample: int, xyz: jax.Array,
                            new_xyz: jax.Array, emit_idx: bool = True,
                            block_m: int = 128, interpret: bool = False):
    """Bucket-sampled fused ball query + centered neighborhood coords.

    xyz (B, N, 3), new_xyz (B, M, 3) -> (grouped_xyz (B, M, nsample, 3)
    f32 centered on the query, cnt (B, M) int32 EXACT hit count capped
    at nsample, and — when emit_idx — idx (B, M, nsample) int32 of the
    selected lanes).  Slot j holds the first in-radius point of lanes
    [j*W, (j+1)*W), W = padded_N / nsample; unfilled slots repeat the
    first filled slot (zero hits: point 0).  See module docstring for
    the tier semantics.  Requires padded N divisible by nsample with a
    power-of-two quotient (true for the SA1/SA2 shapes).
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_pad = -(-N // 128) * 128
    W = n_pad // nsample
    if n_pad % nsample or (W & (W - 1)):
        raise ValueError(
            f"bucket ball query needs padded N ({n_pad}) = nsample "
            f"({nsample}) * power-of-two bucket; use the butterfly tier")
    x = xyz.astype(jnp.float32)
    q = new_xyz.astype(jnp.float32)
    if n_pad != N:
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)),
                    constant_values=1e9)
    # auto-clamp the query block to fit scoped VMEM (16M).  Two measured
    # cost terms: (a) the ~10 live (bm, N) planes ~ 40*bm*n_pad bytes
    # (bm=128 @ N=2048 OOM'd at 18.03M); (b) a Mosaic term that GROWS as
    # N shrinks, ~ 192e6*bm/n_pad bytes — the pair fits all measured
    # probes (OOMs: 64@512 = 23.99M, 128@512 = 44.21M; compiles: 32@512,
    # 64@2048).  bm <= n_pad/16 bounds (b) at ~12M, the plane clamp
    # bounds (a).
    bm = min(block_m, M)
    while bm > 8 and (bm * n_pad > 64 * 2048 or bm * 16 > n_pad):
        bm //= 2
    m_pad = -(-M // bm) * bm
    if m_pad != M:
        q = jnp.pad(q, ((0, 0), (0, m_pad - M), (0, 0)))

    out_specs = [
        pl.BlockSpec((1, bm, nsample), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, nsample), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, nsample), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, nsample), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.float32),
        jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.float32),
        jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.float32),
        jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.int32),
    ]
    if emit_idx:
        out_specs.append(pl.BlockSpec((1, bm, nsample),
                                      lambda b, m: (b, m, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, m_pad, nsample), jnp.int32))

    outs = pl.pallas_call(
        functools.partial(_ballq_bucket_kernel, radius, nsample, N,
                          emit_idx, interpret),
        grid=(B, m_pad // bm),
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(x, q)
    gx, gy, gz, cnt = outs[:4]
    grouped = jnp.stack([gx, gy, gz], axis=-1)[:, :M]
    cnt = cnt[:, :M, 0]
    if emit_idx:
        return grouped, cnt, outs[4][:, :M]
    return grouped, cnt, None
