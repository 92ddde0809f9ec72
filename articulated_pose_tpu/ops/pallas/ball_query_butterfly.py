"""Pallas TPU kernel: fused ball query + grouped-xyz via butterfly compaction.

TPU-native counterpart of the reference's ball query followed by the
grouped-coordinate gather (reference: tf_ops/grouping/tf_grouping_g.cu:3-58,
QueryBallPoint + GroupPoint), preserving the exact CUDA semantics: for
each query, the FIRST `nsample` points (in index order) within `radius`;
unfilled slots hold the first hit; zero hits -> point 0.

Design — the selection is a *monotone stream compaction*, routed on a
butterfly network instead of the per-slot compare+sum sweeps of
ops/pallas/ball_query.py:

- the (BM, N) squared-distance tile is one MXU matmul,
- each hit's output slot is its exclusive prefix rank among hits
  (per-chunk strictly-lower-triangular matmuls, bf16 inputs / f32
  accumulation — exact for 0/1 values with chunk sums <= 256),
- each hit must therefore move LEFT by dist = lane - rank, which is
  non-decreasing along the lane axis.  Monotone shifts route
  collision-free through log2(N) stages of static power-of-2 lane
  rolls + selects, processing distance bits LSB -> MSB (verified
  collision-free by brute force; see tests).  All carried value planes
  (x, y, z, lane index) shift together, so the neighborhood coordinate
  gather costs 2 extra VPU ops per plane per stage instead of a
  separate (B*M*S)-row HBM gather downstream.

Per-element work is ~13 ops x log2(N) stages versus ~3 ops x nsample
sweeps for the sweep kernel — at the SA1 shape (N=2048, S=64) that is
~5x less selection work, and the downstream group_point disappears.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_left(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    if interpret:
        return jnp.roll(x, -shift, axis=-1)
    # pltpu.roll only takes non-negative shifts (and a non-negative axis);
    # left-by-sh == right-by-(N-sh) on the circular lane axis
    return pltpu.roll(x, x.shape[-1] - shift, axis=x.ndim - 1)


def _hits_rank_rem(radius: float, nsample: int, n_valid: int,
                   pts: jax.Array, q: jax.Array):
    """Shared prologue of both kernels: (BM, N) hit mask -> per-query hit
    count, lane iota, and each hit's remaining leftward routing distance.

    The exclusive prefix rank among hits is chunked strictly-lower-
    triangular matmuls; bf16 0/1 inputs with f32 accumulation are exact
    for chunk sums <= 256.
    """
    N = pts.shape[0]
    BM = q.shape[0]
    inner = jnp.dot(q, pts.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (BM, N) on the MXU
    d2 = (jnp.sum(q * q, -1, keepdims=True)
          + jnp.sum(pts * pts, -1)[None, :] - 2.0 * inner)
    lane = lax.broadcasted_iota(jnp.int32, (BM, N), 1)
    hit = (d2 < radius * radius) & (lane < n_valid)
    cnt = jnp.minimum(jnp.sum(hit, -1), nsample).astype(jnp.int32)

    hitf = hit.astype(jnp.bfloat16)
    CH = 256 if N % 256 == 0 else 128
    ii = lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    jj = lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    U = (ii < jj).astype(jnp.bfloat16)

    ranks = []
    off = jnp.zeros((BM, 1), jnp.float32)
    for k in range(N // CH):
        h = hitf[:, k * CH:(k + 1) * CH]
        r = jnp.dot(h, U, preferred_element_type=jnp.float32)
        ranks.append(r + off)
        off = off + (r[:, -1:] + h[:, -1:].astype(jnp.float32))
    rank = jnp.concatenate(ranks, axis=1).astype(jnp.int32)   # (BM, N)

    # remaining leftward distance; _DEAD marks dead lanes (see
    # _butterfly_route for why the sentinel is a lone high bit, not -1)
    rem = jnp.where(hit, lane - rank, _DEAD)
    return lane, cnt, rem


# Dead-lane sentinel for the butterfly's rem control plane: a single
# HIGH bit (bit 30) instead of -1.  Every routing stage tests one shift
# bit `sh` < 2^30, and _DEAD & sh == 0 for all of them, so dead lanes
# (a) never inject into a leftward take and (b) always "keep" — both
# liveness comparisons (srem >= 0, rem >= 0) and one AND per stage
# disappear from the hot loop (~25% of the per-stage VPU work).
_DEAD = 1 << 30


def _butterfly_route(rem: jax.Array, planes, lane: jax.Array,
                     interpret: bool):
    """LSB-first log2(N) power-of-2 roll+select stages (collision-free
    for monotone leftward shifts).  Routes every plane in `planes`
    alongside the rem control plane; wrapped lanes never inject.

    Liveness is encoded in rem itself (_DEAD = 1 << 30): live lanes hold
    their remaining leftward distance (< N <= 2^30 — no shift bit ever
    overlaps the sentinel), dead lanes hold _DEAD whose only set bit no
    stage tests.  Per stage: a lane takes from lane+sh iff that lane's
    rem has the sh bit (dead sources can't), otherwise it keeps its own
    value iff its sh bit is clear (dead lanes always do); a live lane
    whose value departed without a replacement becomes dead.
    """
    N = rem.shape[-1]
    n_bits = max(1, (N - 1).bit_length())
    for b in range(n_bits):
        sh = 1 << b
        if sh >= N:
            break
        srem = _roll_left(rem, sh, interpret)
        # lane < N - sh masks circular wrap (right-end lanes see
        # left-end values after the roll; those must never inject)
        take = ((srem & sh) != 0) & (lane < N - sh)
        rem = jnp.where(take, srem - sh,
                        jnp.where((rem & sh) == 0, rem, _DEAD))
        planes = [jnp.where(take, _roll_left(v, sh, interpret), v)
                  for v in planes]
    return planes


def _roll_up(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    if interpret:
        return jnp.roll(x, -shift, axis=0)
    return pltpu.roll(x, x.shape[0] - shift, axis=0)


def _hits_rank_rem_t(radius: float, nsample: int, n_valid: int,
                     pts: jax.Array, q: jax.Array):
    """Transposed prologue: everything lives as (N, BM) — points on the
    SUBLANE axis, queries on lanes.  Same math as _hits_rank_rem; the
    prefix rank runs down the sublane axis via strictly-lower-triangular
    chunk matmuls (dot(L, h) with L[i,j] = [j < i])."""
    N = pts.shape[0]
    BM = q.shape[0]
    inner = jnp.dot(pts, q.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # (N, BM) on the MXU
    d2 = (jnp.sum(pts * pts, -1, keepdims=True)
          + jnp.sum(q * q, -1)[None, :] - 2.0 * inner)
    sub = lax.broadcasted_iota(jnp.int32, (N, BM), 0)
    hit = (d2 < radius * radius) & (sub < n_valid)
    cnt = jnp.minimum(jnp.sum(hit, 0), nsample).astype(jnp.int32)  # (BM,)

    hitf = hit.astype(jnp.bfloat16)
    CH = 256 if N % 256 == 0 else 128
    ii = lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    jj = lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    L = (jj < ii).astype(jnp.bfloat16)

    ranks = []
    off = jnp.zeros((1, BM), jnp.float32)
    for k in range(N // CH):
        h = hitf[k * CH:(k + 1) * CH, :]
        r = jnp.dot(L, h, preferred_element_type=jnp.float32)
        ranks.append(r + off)
        off = off + (r[-1:, :] + h[-1:, :].astype(jnp.float32))
    rank = jnp.concatenate(ranks, axis=0).astype(jnp.int32)   # (N, BM)

    rem = jnp.where(hit, sub - rank, _DEAD)
    return sub, cnt, rem


def _butterfly_route_t(rem: jax.Array, planes, sub: jax.Array,
                       interpret: bool):
    """Sublane-axis twin of _butterfly_route: identical routing logic,
    but every roll moves data UP the sublane axis of the (N, BM) tiles.

    Motivation (docs/perf_round4.md): lane-axis roll cost scales with
    the shift and spikes when a chain mixes shift granularities (Mosaic
    inserts layout conversions between differently-rotated vregs);
    sublane shifts are cross-vreg register moves whose cost is
    hypothesized flat in the shift amount — measured by
    scripts/diag_roll_cost.py before this variant was added."""
    N = rem.shape[0]
    n_bits = max(1, (N - 1).bit_length())
    for b in range(n_bits):
        sh = 1 << b
        if sh >= N:
            break
        srem = _roll_up(rem, sh, interpret)
        take = ((srem & sh) != 0) & (sub < N - sh)
        rem = jnp.where(take, srem - sh,
                        jnp.where((rem & sh) == 0, rem, _DEAD))
        planes = [jnp.where(take, _roll_up(v, sh, interpret), v)
                  for v in planes]
    return planes


def _quantize_pack_coords(pts: jax.Array, n_valid: int):
    """10-bit-per-component fixed-point pack of the raw coordinates —
    the SHARED prologue of both packed kernels (lane and transposed;
    any fix here applies to both).

    pts (N, 3) -> (packed (N,) i32, mn (3,), ext (3,)).  Quantizes each
    component over the masked per-component cloud bbox (padded lanes —
    wrapper pads with 1e9 — are excluded) and packs 3x10 bits into one
    i32 per point.

    MOSAIC WORKAROUND (load-bearing): pack via a lane-wise shift +
    minor-dim sum, NOT per-lane extracts
    (`qp[:, 0] | (qp[:, 1] << 10) | (qp[:, 2] << 20)`): the extract+
    shift+or chain miscompiles on current Mosaic — the z field comes
    out 1..7 units LOW on ~0.6% of points (isolated to `qp[:, 2] << 20`
    broadcast alone; the identical expression OR'd with another lane
    extract compiles correctly).  The sum form measured exact on chip
    up to the benign half-quantum boundary flips from the VPU's 1-ulp
    reciprocal in `scl`.  See docs/perf_round3.md (Mosaic findings).
    """
    N = pts.shape[0]
    lane_n = lax.broadcasted_iota(jnp.int32, (N, 3), 0)
    valid_n = lane_n < n_valid
    mn = jnp.min(jnp.where(valid_n, pts, jnp.inf), axis=0)     # (3,)
    mx = jnp.max(jnp.where(valid_n, pts, -jnp.inf), axis=0)
    ext = jnp.maximum(mx - mn, 1e-6)
    scl = 1023.0 / ext
    qp = jnp.clip(jnp.floor((pts - mn[None, :]) * scl[None, :] + 0.5),
                  0.0, 1023.0).astype(jnp.int32)               # (N, 3)
    lane_sh = lax.broadcasted_iota(jnp.int32, (N, 3), 1) * 10
    return jnp.sum(qp << lane_sh, axis=1), mn, ext


def _ballq_butterfly_kernel_t(radius: float, nsample: int, n_valid: int,
                              emit_idx: bool, interpret: bool,
                              xyz_ref, q_ref, *out_refs):
    """Transposed exact kernel: planes are (N, BM), outputs (nsample, BM)
    slices of the routed planes (the wrapper transposes back)."""
    pts = xyz_ref[0]                                   # (N, 3)
    q = q_ref[0]                                       # (BM, 3)
    N = pts.shape[0]
    BM = q.shape[0]

    sub, cnt, rem = _hits_rank_rem_t(radius, nsample, n_valid, pts, q)

    # (N, 1) column slices broadcast along lanes — the transposed twin of
    # the load-bearing row-broadcast producer shape
    planes = [jnp.broadcast_to(pts[:, c:c + 1], (N, BM)) for c in range(3)]
    if emit_idx:
        planes.append(sub)

    planes = _butterfly_route_t(rem, planes, sub, interpret)

    row = lax.broadcasted_iota(jnp.int32, (nsample, BM), 0)
    filled = row < cnt[None, :]
    any_hit = cnt[None, :] > 0

    out_i = 0
    for c in range(3):
        v = planes[c][:nsample, :]
        fill = jnp.where(any_hit, v[0:1, :], pts[0, c])
        out_refs[out_i][0, :, :] = (jnp.where(filled, v, fill)
                                    - q[:, c][None, :])
        out_i += 1
    out_refs[out_i][0, :, :] = jnp.broadcast_to(cnt[None, :], (8, BM))
    out_i += 1
    if emit_idx:
        vl = planes[3][:nsample, :]
        fill = jnp.where(any_hit, vl[0:1, :], 0)
        out_refs[out_i][0, :, :] = jnp.where(filled, vl, fill)


def _ballq_butterfly_packed_kernel_t(radius: float, nsample: int,
                                     n_valid: int, emit_idx: bool,
                                     interpret: bool,
                                     xyz_ref, q_ref, *out_refs):
    """Transposed packed kernel: one (N, BM) i32 plane of 10-bit packed
    raw coordinates (same quantization contract as the lane version)."""
    pts = xyz_ref[0]                                   # (N, 3)
    q = q_ref[0]                                       # (BM, 3)
    N = pts.shape[0]
    BM = q.shape[0]

    sub, cnt, rem = _hits_rank_rem_t(radius, nsample, n_valid, pts, q)

    # shared quantize/pack prologue (Mosaic pack workaround lives there)
    packed_vec, mn, ext = _quantize_pack_coords(pts, n_valid)
    packed_col = packed_vec[:, None]                            # (N, 1)
    planes = [jnp.broadcast_to(packed_col, (N, BM))]
    if emit_idx:
        planes.append(sub)

    planes = _butterfly_route_t(rem, planes, sub, interpret)

    row = lax.broadcasted_iota(jnp.int32, (nsample, BM), 0)
    filled = row < cnt[None, :]
    any_hit = cnt[None, :] > 0

    out_i = 0
    v1 = planes[0][:nsample, :]
    inv = ext * (1.0 / 1023.0)
    for c, shift in ((0, 0), (1, 10), (2, 20)):
        comp = ((v1 >> shift) & 1023).astype(jnp.float32) * inv[c] + mn[c]
        p0 = ((packed_col[0, 0] >> shift) & 1023).astype(jnp.float32) \
            * inv[c] + mn[c]
        fill = jnp.where(any_hit, comp[0:1, :], p0)
        out_refs[out_i][0, :, :] = (jnp.where(filled, comp, fill)
                                    - q[:, c][None, :])
        out_i += 1
    out_refs[out_i][0, :, :] = jnp.broadcast_to(cnt[None, :], (8, BM))
    out_i += 1
    if emit_idx:
        vl = planes[1][:nsample, :]
        fill = jnp.where(any_hit, vl[0:1, :], 0)
        out_refs[out_i][0, :, :] = jnp.where(filled, vl, fill)


def _ballq_butterfly_kernel(radius: float, nsample: int, n_valid: int,
                            emit_idx: bool, interpret: bool,
                            xyz_ref, q_ref, *out_refs):
    # xyz_ref (1, N, 3) points; q_ref (1, BM, 3) queries
    pts = xyz_ref[0]                                   # (N, 3)
    q = q_ref[0]                                       # (BM, 3)
    N = pts.shape[0]
    BM = q.shape[0]

    lane, cnt, rem = _hits_rank_rem(radius, nsample, n_valid, pts, q)

    # value planes that ride the butterfly together: pure row-broadcasts
    # of length-N vectors (this producer shape is load-bearing for the
    # Mosaic lowering — see _ballq_butterfly_packed_kernel)
    planes = [jnp.broadcast_to(pts[:, c][None, :], (BM, N)) for c in range(3)]
    if emit_idx:
        planes.append(lane.astype(jnp.float32))

    planes = _butterfly_route(rem, planes, lane, interpret)

    col = lax.broadcasted_iota(jnp.int32, (BM, nsample), 1)
    filled = col < cnt[:, None]
    any_hit = cnt[:, None] > 0

    out_i = 0
    qx = [q[:, c][:, None] for c in range(3)]
    for c in range(3):
        v = planes[c][:, :nsample]
        # unfilled slots -> first hit (slot 0); zero hits -> point 0
        fill = jnp.where(any_hit, v[:, 0:1], pts[0, c])
        out_refs[out_i][0, :, :] = jnp.where(filled, v, fill) - qx[c]
        out_i += 1
    # cnt output (1, 8, BM): sublane dim padded to the i32 tile minimum
    out_refs[out_i][0, :, :] = jnp.broadcast_to(cnt[None, :], (8, BM))
    out_i += 1
    if emit_idx:
        vl = planes[3][:, :nsample]
        fill = jnp.where(any_hit, vl[:, 0:1], 0.0)
        out_refs[out_i][0, :, :] = jnp.where(filled, vl,
                                             fill).astype(jnp.int32)


def _ballq_butterfly_packed_kernel(radius: float, nsample: int, n_valid: int,
                                   emit_idx: bool, interpret: bool,
                                   xyz_ref, q_ref, *out_refs):
    """Packed variant: 2-3 planes ride the butterfly instead of 4-5.

    The three coordinate planes collapse into ONE i32 plane carrying the
    RAW point coordinates quantized per component to 10-bit fixed point
    over the (masked) per-component cloud extent, packed 3-in-one.  The
    query subtraction happens at extraction — exactly like the exact
    kernel, which also routes pure broadcasts of pts and subtracts q at
    the output.  That producer shape is load-bearing: every formulation
    whose butterfly planes mixed in q (centered/quantized diffs, f32
    bitcasts, lane|rem bit-packing on the control plane) either hung the
    Mosaic pipeline (>6 min at this shape) or crashed it
    (`Check failed: limits[i] <= dim(i)` in LoweringEmitter); broadcast
    producers compile in seconds.  See docs/perf_round3.md.

    Cost: grouped coordinates carry <= extent_c/2046 absolute
    quantization error per component (round-to-nearest over the cloud's
    bbox); idx and cnt stay exact.  For NOCS-normalized clouds
    (extent ~1) that is ~5e-4 — the same order as the bf16 rounding the
    downstream PointConv applies to these coordinates anyway.
    """
    pts = xyz_ref[0]                                   # (N, 3)
    q = q_ref[0]                                       # (BM, 3)
    N = pts.shape[0]
    BM = q.shape[0]

    lane, cnt, rem = _hits_rank_rem(radius, nsample, n_valid, pts, q)

    # ---- packed coordinate plane (pure function of pts, row-broadcast).
    # Shared quantize/pack prologue — the Mosaic shift+or pack
    # workaround lives in _quantize_pack_coords (both variants use it).
    packed_vec, mn, ext = _quantize_pack_coords(pts, n_valid)
    p1 = jnp.broadcast_to(packed_vec[None, :], (BM, N))
    planes = [p1]
    if emit_idx:
        planes.append(lane)                                    # i32 iota plane

    planes = _butterfly_route(rem, planes, lane, interpret)

    col = lax.broadcasted_iota(jnp.int32, (BM, nsample), 1)
    filled = col < cnt[:, None]
    any_hit = cnt[:, None] > 0

    out_i = 0
    v1 = planes[0][:, :nsample]
    inv = ext * (1.0 / 1023.0)
    for c, shift in ((0, 0), (1, 10), (2, 20)):
        comp = ((v1 >> shift) & 1023).astype(jnp.float32) * inv[c] + mn[c]
        # unfilled slots -> first hit; zero hits -> (quantized) point 0
        p0 = ((packed_vec[0] >> shift) & 1023).astype(jnp.float32) \
            * inv[c] + mn[c]
        fill = jnp.where(any_hit, comp[:, 0:1], p0)
        out_refs[out_i][0, :, :] = (jnp.where(filled, comp, fill)
                                    - q[:, c][:, None])
        out_i += 1
    out_refs[out_i][0, :, :] = jnp.broadcast_to(cnt[None, :], (8, BM))
    out_i += 1
    if emit_idx:
        vl = planes[1][:, :nsample]
        fill = jnp.where(any_hit, vl[:, 0:1], 0)
        out_refs[out_i][0, :, :] = jnp.where(filled, vl, fill)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7, 8))
def query_ball_group_pallas(radius: float, nsample: int, xyz: jax.Array,
                            new_xyz: jax.Array, emit_idx: bool = True,
                            block_m: int = 128, interpret: bool = False,
                            packed: bool = False, transposed: bool = False):
    """Fused ball query + centered neighborhood coordinates.

    xyz (B, N, 3), new_xyz (B, M, 3) -> (grouped_xyz (B, M, nsample, 3)
    f32 with the query point subtracted, cnt (B, M) int32, and — when
    emit_idx — idx (B, M, nsample) int32 matching
    ops.core.query_ball_point exactly).  grouped_xyz equals
    group_point(xyz, idx) - new_xyz[:, :, None].

    The grid tiles (batch, query blocks of block_m); the point set stays
    VMEM-resident per block.  The backbone path uses emit_idx=False —
    nothing downstream consumes the indices, and dropping the index
    plane removes ~20% of the butterfly's select work.

    packed=True routes 2 planes (3 with emit_idx) through the butterfly
    instead of 4-5: the coordinates ride as ONE i32 plane of 10-bit
    fixed-point RAW coords packed 3-in-one (quantized over the masked
    per-component cloud bbox), plus the rem control plane and, when
    emit_idx, a lane plane.  Grouped coordinates then carry
    <= extent_c/2046 absolute quantization error per component; idx and
    cnt stay exact.  See _ballq_butterfly_packed_kernel.

    transposed=True runs the sublane-routing twin: the (points, queries)
    tiles are (N, BM) with points on the SUBLANE axis, so every routing
    roll is a cross-vreg sublane move instead of a lane rotation (lane
    roll cost grows with shift and granularity mixing —
    docs/perf_round4.md).  Bitwise-identical outputs; the wrapper
    transposes the (nsample, BM) kernel outputs back.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_pad = -(-N // 128) * 128
    x = xyz.astype(jnp.float32)
    q = new_xyz.astype(jnp.float32)
    if n_pad != N:
        # pad with far-away points so they never hit
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)),
                    constant_values=1e9)
    bm = min(block_m, M)
    m_pad = -(-M // bm) * bm
    if m_pad != M:
        q = jnp.pad(q, ((0, 0), (0, m_pad - M), (0, 0)))

    if transposed:
        plane_spec = pl.BlockSpec((1, nsample, bm), lambda b, m: (b, 0, m),
                                  memory_space=pltpu.VMEM)
        plane_shape = (B, nsample, m_pad)
    else:
        plane_spec = pl.BlockSpec((1, bm, nsample), lambda b, m: (b, m, 0),
                                  memory_space=pltpu.VMEM)
        plane_shape = (B, m_pad, nsample)
    out_specs = [
        plane_spec, plane_spec, plane_spec,
        pl.BlockSpec((1, 8, bm), lambda b, m: (b, 0, m),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(plane_shape, jnp.float32),
        jax.ShapeDtypeStruct(plane_shape, jnp.float32),
        jax.ShapeDtypeStruct(plane_shape, jnp.float32),
        jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
    ]
    if emit_idx:
        out_specs.append(plane_spec)
        out_shape.append(jax.ShapeDtypeStruct(plane_shape, jnp.int32))

    if transposed:
        kern = (_ballq_butterfly_packed_kernel_t if packed
                else _ballq_butterfly_kernel_t)
    else:
        kern = (_ballq_butterfly_packed_kernel if packed
                else _ballq_butterfly_kernel)
    outs = pl.pallas_call(
        functools.partial(kern, radius, nsample, N,
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
    if transposed:
        gx, gy, gz = (jnp.swapaxes(v, 1, 2) for v in (gx, gy, gz))
    grouped = jnp.stack([gx, gy, gz], axis=-1)[:, :M]
    cnt = cnt[:, 0, :M]
    if emit_idx:
        idx = outs[4]
        if transposed:
            idx = jnp.swapaxes(idx, 1, 2)
        return grouped, cnt, idx[:, :M]
    return grouped, cnt, None
