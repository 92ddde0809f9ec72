"""Joint-constrained Levenberg–Marquardt rotation refinement.

Rebuild of the reference's scipy `least_squares(method='lm')` solve
(reference: evaluation/parallel_ancsh_pose.py:106-184) as a fixed-
iteration damped Gauss–Newton on the 6-dof rotation-vector pair,
batchable with vmap over frames × hypotheses:

- residuals of `objective_eval` (revolute: per-part point residuals plus
  joint-axis consistency rows R(v0)·a − R(v1)·a, parallel_ancsh_pose.py:
  56-68) and `objective_eval_r` (prismatic: rotvec difference rows,
  :70-81),
- the reference replicates the joint row min(n0,n1) times; here it is a
  single row weighted by sqrt(multiplicity), which contributes
  identically to JᵀJ and Jᵀr,
- masked padded point buffers; Jacobians via jax.jacfwd (6 columns).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-12


def rotvec_rotate(points: jax.Array, rotvec: jax.Array) -> jax.Array:
    """Rodrigues rotation of (N, 3) points by a (3,) rotation vector.

    Matches lib/d3_utils.py:150-163 (rotate_points_with_rotvec), with the
    θ→0 limit made smooth for AD.
    """
    theta2 = jnp.sum(rotvec * rotvec)
    theta = jnp.sqrt(theta2 + EPS)
    v = rotvec / theta
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    dot = points @ v
    return (cos * points + sin * jnp.cross(jnp.broadcast_to(v, points.shape), points)
            + (1.0 - cos) * dot[:, None] * v[None, :])


def rotvec_to_matrix(rotvec: jax.Array) -> jax.Array:
    theta2 = jnp.sum(rotvec * rotvec)
    theta = jnp.sqrt(theta2 + EPS)
    k = rotvec / theta
    K = jnp.array([[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]])
    return jnp.eye(3) + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)


def matrix_to_rotvec(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues; stable near θ=0, adequate away from θ=π."""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    axis_raw = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, EPS))
    axis = axis_raw / (2.0 * sin)
    # near θ=π, fall back to the dominant diagonal axis
    diag = jnp.sqrt(jnp.maximum((jnp.diag(R) + 1.0) / 2.0, 0.0))
    dom = jnp.argmax(diag)
    alt = diag * jnp.sign(axis_raw + 1e-30)
    alt = alt.at[dom].set(diag[dom])
    use_alt = theta > (jnp.pi - 1e-3)
    axis = jnp.where(use_alt, alt / jnp.maximum(jnp.linalg.norm(alt), EPS), axis)
    return axis * theta


def joint_residuals(params: jax.Array, x0, y0, m0, x1, y1, m1,
                    joint_dir: jax.Array, joint_mult: jax.Array,
                    prismatic: bool) -> jax.Array:
    """Stacked masked residual vector for the 6-dof rotvec pair.

    x*/y* (P, 3) padded source/target (centered, target pre-scaled),
    m* (P,) masks, joint_dir (3,), joint_mult scalar = row multiplicity.
    """
    v0, v1 = params[:3], params[3:]
    r0 = (y0 - rotvec_rotate(x0, v0)) * m0[:, None]
    r1 = (y1 - rotvec_rotate(x1, v1)) * m1[:, None]
    if prismatic:
        rj = (v0 - v1)[None, :] * jnp.sqrt(joint_mult)
    else:
        a = joint_dir[None, :]
        rj = (rotvec_rotate(a, v0) - rotvec_rotate(a, v1)) * jnp.sqrt(joint_mult)
    return jnp.concatenate([r0.ravel(), r1.ravel(), rj.ravel()])


def _skew(v: jax.Array) -> jax.Array:
    return jnp.array([[0.0, -v[2], v[1]],
                      [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]])


def _right_jacobian(rotvec: jax.Array) -> jax.Array:
    """SO(3) right Jacobian Jr(v): exp(v+δ) ≈ exp(v)·exp(Jr(v)·δ).

    Uses the same θ = sqrt(θ²+EPS) smoothing as rotvec_rotate so the
    analytic Gauss–Newton below matches jax.jacfwd of that residual.
    """
    theta2 = jnp.sum(rotvec * rotvec)
    theta = jnp.sqrt(theta2 + EPS)
    K = _skew(rotvec / theta)
    a = (1.0 - jnp.cos(theta)) / theta
    b = (theta - jnp.sin(theta)) / theta
    return jnp.eye(3) - a * K + b * (K @ K)


@functools.partial(jax.jit, static_argnames=("iters", "prismatic"))
def lm_refine_joint(rotvec0: jax.Array, rotvec1: jax.Array,
                    x0, y0, m0, x1, y1, m1, joint_dir,
                    joint_mult, *, iters: int = 20,
                    prismatic: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Damped Gauss–Newton from (rotvec0, rotvec1).  Returns refined pair.

    The normal equations are assembled ANALYTICALLY instead of via
    jax.jacfwd (which evaluates the residual 6× and materializes a
    (rows, 6) Jacobian): with D(v,x) = ∂(R(v)x)/∂v = −R(v)·skew(x)·Jr(v)
    and skew(x)ᵀskew(x) = |x|²I − xxᵀ,

      H_kk = Jrₖᵀ [ Σ_p m² (|x|²I − xxᵀ) + mult·(|a|²I − aaᵀ) ] Jrₖ

    where the bracketed second-moment matrix is CONSTANT over the
    iteration (points don't move), so each step costs two Rodrigues
    rotations, one cross-product sweep for the gradient, and a 6×6
    solve — measured ~3× less than the jacfwd formulation at the refit
    shape on v5e.  Verified against jacfwd to ~1e-5 (tests/test_pose.py).
    """
    a = joint_dir
    sqm = jnp.sqrt(joint_mult)

    def moment(x, m):
        w = (m * m)[:, None]
        xx = (x * w).T @ x                              # Σ m² x xᵀ (3,3)
        return jnp.trace(xx) * jnp.eye(3) - xx

    Ma = joint_mult * (jnp.sum(a * a) * jnp.eye(3) - jnp.outer(a, a))
    M0 = moment(x0, m0) + (0.0 if prismatic else 1.0) * Ma
    M1 = moment(x1, m1) + (0.0 if prismatic else 1.0) * Ma
    Ka = _skew(a)

    params0 = jnp.concatenate([rotvec0, rotvec1])

    def resid(p):
        return joint_residuals(p, x0, y0, m0, x1, y1, m1, joint_dir,
                               joint_mult, prismatic)

    def cost(p):
        r = resid(p)
        return jnp.sum(r * r)

    def body(carry, _):
        p, lam = carry
        v0, v1 = p[:3], p[3:]
        R0 = rotvec_to_matrix(v0)
        R1 = rotvec_to_matrix(v1)
        Jr0 = _right_jacobian(v0)
        Jr1 = _right_jacobian(v1)

        e0 = y0 - x0 @ R0.T                             # (P, 3) unmasked
        e1 = y1 - x1 @ R1.T
        # g point terms: −Σ m² x × (Rᵀe)   (D(v,x)ᵀe = Jrᵀ (x × Rᵀe))
        u0 = e0 @ R0                                    # Rᵀ e
        u1 = e1 @ R1
        w0 = (m0 * m0)[:, None]
        w1 = (m1 * m1)[:, None]
        c0 = jnp.sum(jnp.cross(x0, u0) * w0, axis=0)
        c1 = jnp.sum(jnp.cross(x1, u1) * w1, axis=0)

        H00 = Jr0.T @ M0 @ Jr0
        H11 = Jr1.T @ M1 @ Jr1
        if prismatic:
            H00 = H00 + joint_mult * jnp.eye(3)
            H11 = H11 + joint_mult * jnp.eye(3)
            H01 = -joint_mult * jnp.eye(3)
            rj = (v0 - v1) * sqm
            g0 = -Jr0.T @ c0 + sqm * rj
            g1 = -Jr1.T @ c1 - sqm * rj
        else:
            Da0 = -R0 @ Ka @ Jr0                        # ∂(R0 a)/∂v0
            Da1 = -R1 @ Ka @ Jr1
            H01 = -joint_mult * (Da0.T @ Da1)
            rj = (R0 @ a - R1 @ a) * sqm
            g0 = -Jr0.T @ c0 + sqm * (Da0.T @ rj)
            g1 = -Jr1.T @ c1 - sqm * (Da1.T @ rj)
        H = jnp.block([[H00, H01], [H01.T, H11]])
        g = jnp.concatenate([g0, g1])

        dp = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
        p_new = p + dp
        base = (jnp.sum(e0 * e0 * w0) + jnp.sum(e1 * e1 * w1)
                + jnp.sum(rj * rj))
        better = cost(p_new) < base
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, lam * 0.33, lam * 3.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(body, (params0, jnp.asarray(1e-3)), None, length=iters)
    return p[:3], p[3:]


@functools.partial(jax.jit, static_argnames=("iters", "prismatic"))
def lm_refine_joint_ad(rotvec0: jax.Array, rotvec1: jax.Array,
                       x0, y0, m0, x1, y1, m1, joint_dir,
                       joint_mult, *, iters: int = 20,
                       prismatic: bool = False) -> Tuple[jax.Array, jax.Array]:
    """jax.jacfwd reference implementation of lm_refine_joint (kept as
    the oracle for the analytic normal equations; tests/test_pose.py)."""
    params0 = jnp.concatenate([rotvec0, rotvec1])

    def resid(p):
        return joint_residuals(p, x0, y0, m0, x1, y1, m1, joint_dir,
                               joint_mult, prismatic)

    def cost(p):
        r = resid(p)
        return jnp.sum(r * r)

    def body(carry, _):
        p, lam = carry
        r = resid(p)
        J = jax.jacfwd(resid)(p)                        # (R, 6)
        g = J.T @ r                                     # (6,)
        H = J.T @ J                                     # (6, 6)
        dp = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
        p_new = p + dp
        better = cost(p_new) < jnp.sum(r * r)
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, lam * 0.33, lam * 3.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(body, (params0, jnp.asarray(1e-3)), None, length=iters)
    return p[:3], p[3:]


def alternating_joint_rotations(x0, y0, w0, x1, y1, w1, joint_dir,
                                iters: int = 20):
    """Coordinate-descent variant of the coupled rotation solve.

    Rebuild of estimateSimilarityUmeyamaCoords' EM-style alternation
    (reference: lib/aligning.py:214-295 and the `isalternate` branch of
    parallel_ancsh_pose.py:158-172): alternately re-fit R0 with the joint
    axis rotated by R1 appended as an extra correspondence, then R1 with
    the axis rotated by R0, until (here: for a fixed number of) sweeps.

    x*/y* (P, 3) centered masked buffers, w* (P,) weights.  The joint row
    is weighted by min(Σw0, Σw1) to mirror the reference's replicated
    joint_points rows.
    """
    from articulated_pose_tpu.pose import umeyama

    mult = jnp.minimum(jnp.sum(w0), jnp.sum(w1))
    a = joint_dir[None, :]

    def aug_fit(x, y, w, axis_target):
        xa = jnp.concatenate([x, a], axis=0)
        ya = jnp.concatenate([y, axis_target], axis=0)
        wa = jnp.concatenate([w, jnp.full((1,), mult, w.dtype)], axis=0)
        return umeyama.kabsch_rotation(xa, ya, wa)

    def body(_, carry):
        R0, R1 = carry
        R0 = aug_fit(x0, y0, w0, (R1 @ a.T).T)
        R1 = aug_fit(x1, y1, w1, (R0 @ a.T).T)
        return R0, R1

    R0 = umeyama.kabsch_rotation(x0, y0, w0)
    R1 = umeyama.kabsch_rotation(x1, y1, w1)
    return jax.lax.fori_loop(0, iters, body, (R0, R1))


class JointFit(NamedTuple):
    R0: jax.Array
    s0: jax.Array
    t0: jax.Array
    R1: jax.Array
    s1: jax.Array
    t1: jax.Array


def joint_transformation_estimate_alt(src0, tgt0, m0, src1, tgt1, m1,
                                      joint_dir, *, sweeps: int = 3,
                                      prismatic: bool = False) -> JointFit:
    """Closed-form coupled similarity fit via alternating Kabsch sweeps.

    The cheap counterpart of joint_transformation_estimate for RANSAC
    hypothesis generation: the reference's own `isalternate` branch
    (parallel_ancsh_pose.py:158-172 / lib/aligning.py:240-257) —
    alternately refit each part's rotation with the joint axis rotated by
    the other part appended as a correspondence.  No Jacobians, no 6×6
    solves: each sweep is two batched 3×3 SVDs, ~20× cheaper per
    hypothesis than the LM variant (measured on v5e).  For prismatic
    joints the constraint is R0 == R1 exactly, so a single Kabsch over
    the union of both parts' correspondences solves it in closed form.
    """
    from articulated_pose_tpu.pose import umeyama

    w0 = m0.astype(src0.dtype)
    w1 = m1.astype(src1.dtype)
    scale0, scale0_inv = umeyama.pairwise_scale_both(src0, tgt0, w0)
    scale1, scale1_inv = umeyama.pairwise_scale_both(src1, tgt1, w1)

    def centered(x, w):
        mu = jnp.sum(x * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        return (x - mu) * w[:, None]

    y0 = centered(tgt0 * scale0_inv, w0)
    x0 = centered(src0, w0)
    y1 = centered(tgt1 * scale1_inv, w1)
    x1 = centered(src1, w1)

    if prismatic:
        xc = jnp.concatenate([x0, x1], axis=0)
        yc = jnp.concatenate([y0, y1], axis=0)
        wc = jnp.concatenate([w0, w1], axis=0)
        R0 = R1 = umeyama.kabsch_rotation(xc, yc, wc)
    else:
        R0, R1 = alternating_joint_rotations(x0, y0, w0, x1, y1, w1,
                                             joint_dir, iters=sweeps)

    def trans(tgt, src, w, s, R):
        mu_t = jnp.sum(tgt * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        mu_s = jnp.sum(src * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        return mu_t - s * (R @ mu_s)

    t0 = trans(tgt0, src0, w0, scale0, R0)
    t1 = trans(tgt1, src1, w1, scale1, R1)
    return JointFit(R0=R0, s0=scale0, t0=t0, R1=R1, s1=scale1, t1=t1)


def joint_transformation_estimate(src0, tgt0, m0, src1, tgt1, m1,
                                  joint_dir, *, lm_iters: int = 20,
                                  prismatic: bool = False) -> JointFit:
    """Two-part coupled similarity fit (parallel_ancsh_pose.py:106-184).

    src*/tgt* are masked padded (P, 3) buffers.  Pre-scales targets with
    the pairwise inverse scale, centers both sides, initializes rotations
    with Kabsch, runs the joint LM, then recovers translations closed-form
    with the forward pairwise scales.
    """
    from articulated_pose_tpu.pose import umeyama

    w0 = m0.astype(src0.dtype)
    w1 = m1.astype(src1.dtype)
    scale0, scale0_inv = umeyama.pairwise_scale_both(src0, tgt0, w0)
    scale1, scale1_inv = umeyama.pairwise_scale_both(src1, tgt1, w1)

    def centered(x, w):
        mu = jnp.sum(x * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        return (x - mu) * w[:, None]

    y0 = centered(tgt0 * scale0_inv, w0)
    x0 = centered(src0, w0)
    y1 = centered(tgt1 * scale1_inv, w1)
    x1 = centered(src1, w1)

    R0 = umeyama.kabsch_rotation(src0, tgt0, w0)
    R1 = umeyama.kabsch_rotation(src1, tgt1, w1)
    v0 = matrix_to_rotvec(R0)
    v1 = matrix_to_rotvec(R1)
    mult = jnp.minimum(jnp.sum(w0), jnp.sum(w1))
    v0, v1 = lm_refine_joint(v0, v1, x0, y0, w0, x1, y1, w1, joint_dir,
                             mult, iters=lm_iters, prismatic=prismatic)
    R0, R1 = rotvec_to_matrix(v0), rotvec_to_matrix(v1)

    def trans(tgt, src, w, s, R):
        mu_t = jnp.sum(tgt * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        mu_s = jnp.sum(src * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
        return mu_t - s * (R @ mu_s)

    t0 = trans(tgt0, src0, w0, scale0, R0)
    t1 = trans(tgt1, src1, w1, scale1, R1)
    return JointFit(R0=R0, s0=scale0, t0=t0, R1=R1, s1=scale1, t1=t1)
