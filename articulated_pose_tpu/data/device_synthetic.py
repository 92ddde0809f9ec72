"""On-device synthetic data generation (zero host↔device traffic).

The training analogue of data/synthetic.py but as pure jnp: canonical
part geometry, joints and normalization constants live in HBM once; each
train step draws articulation states + camera similarity with
jax.random, articulates, projects, and builds all per-point labels
(NOCS/NAOCS, joint heatmap/unitvec/axis/association, masks) inside the
compiled step.

Motivation: the development tunnel moves ~10 MB/s host→device, so a
4 MB label batch costs ~0.5 s while the train step itself takes ~2 ms.
Generating on device removes the feed path entirely — the same design
lesson as the reference's feed_dict bottleneck (SURVEY.md §5), taken to
its conclusion.  GT poses per part are also produced, so pose-fit
evaluation can run fully on device too.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from articulated_pose_tpu.data.labeling import nocs_normalize, point_line_offset
from articulated_pose_tpu.data.synthetic import SyntheticArticulated

_JT = {"revolute": 0, "prismatic": 1, "fixed": 2}


class DeviceSynthetic:
    """Device-resident twin of a SyntheticArticulated generator."""

    def __init__(self, gen: SyntheticArticulated, *, num_points: int = 1024,
                 noise: float = 0.005):
        self.num_points = num_points
        self.noise = noise
        self.n_parts = gen.n_parts
        self.full_rotation = gen.full_rotation
        K = gen.n_parts

        canon = np.concatenate(gen.parts_canon, axis=0)         # (Ntot, 3)
        part_of = np.concatenate([np.full(len(p), j, np.int32)
                                  for j, p in enumerate(gen.parts_canon)])
        if canon.shape[0] < num_points:
            # tile short clouds (device twin of lib/dataset.py:290-317)
            tile = num_points // canon.shape[0] + 1
            canon = np.concatenate([canon] * tile, axis=0)
            part_of = np.concatenate([part_of] * tile, axis=0)
        self.n_total = canon.shape[0]

        # static normalization constants
        corners = np.stack([np.asarray(c, np.float64) for c in gen.norm.corners])
        factors = np.asarray(gen.norm.factors, np.float64)
        g_c, g_f = corners[0], factors[0]

        # precompute per-point part NOCS and global NAOCS (articulation
        # doesn't change canonical coords, so labels are static per point!)
        nocs_p = np.zeros_like(canon)
        for j in range(K):
            sel = part_of == j
            nocs_p[sel] = nocs_normalize(canon[sel], corners[j + 1], factors[j + 1])
        nocs_g = nocs_normalize(canon, g_c, g_f)

        # joint lines in global NOCS + per-point joint labels (also static)
        n_joints = len(gen.joints)
        jP0, jL, jtypes = [], [], []
        joint_params = np.zeros((K, 7), np.float32)
        for k, jt in enumerate(gen.joints):
            P0 = nocs_normalize(jt.position.reshape(1, 3), g_c, g_f)[0]
            L = np.asarray(jt.axis, np.float64)
            L = L / max(np.linalg.norm(L), 1e-9)
            jP0.append(P0)
            jL.append(L)
            jtypes.append(_JT[jt.jtype])
            slot = min(k + 1, K - 1)
            orth = point_line_offset(P0, L, np.zeros((1, 3)))[0]
            d = float(np.linalg.norm(orth))
            joint_params[slot, 0:3] = L
            joint_params[slot, 6] = d
            joint_params[slot, 3:6] = orth / max(d, 1e-9)

        incidence = np.zeros((K, n_joints), bool)
        for k, jt in enumerate(gen.joints):
            incidence[jt.child, k] = True
            incidence[jt.parent, k] = True

        thres_r = 0.2
        heat = np.zeros(self.n_total, np.float32)
        unitv = np.zeros((self.n_total, 3), np.float32)
        orient = np.zeros((self.n_total, 3), np.float32)
        jcls = np.zeros(self.n_total, np.float32)
        for k in range(n_joints):
            if jtypes[k] == 2:
                continue
            touch = incidence[part_of, k]
            if jtypes[k] == 1:
                off = np.full((self.n_total, 3), 0.5 * thres_r)
                hm = np.full(self.n_total, np.sqrt(3) * 0.5 * thres_r)
                idc = touch
            else:
                off = point_line_offset(jP0[k], jL[k], nocs_g)
                hm = np.linalg.norm(off, axis=1)
                idc = touch & (hm < thres_r)
            heat[idc] = 1 - hm[idc] / thres_r
            unitv[idc] = off[idc] / (hm[idc, None] + 1e-8)
            orient[idc] = jL[k]
            jcls[idc] = k + 1

        # device constants
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        self.canon = f32(canon)
        self.part_of = jnp.asarray(part_of)
        self.nocs_p = f32(nocs_p)
        self.nocs_g = f32(nocs_g)
        self.heat = f32(heat)
        self.unitv = f32(unitv)
        self.orient = f32(orient)
        self.jcls = f32(jcls)
        self.joint_params = f32(joint_params)
        self.g_factor = float(g_f)
        # per-part box centers/factors for GT pose composition
        self.part_centers = f32((corners[1:, 0] + corners[1:, 1]) / 2.0)  # (K,3)
        self.part_factors = f32(factors[1:])                              # (K,)
        # joint geometry in the canonical frame for articulation
        self.joint_pos = f32(np.stack([j.position for j in gen.joints])
                             if n_joints else np.zeros((0, 3)))
        ax = np.stack([j.axis / np.linalg.norm(j.axis) for j in gen.joints]) \
            if n_joints else np.zeros((0, 3))
        self.joint_axis = f32(ax)
        self.joint_type = tuple(int(t) for t in jtypes)  # static
        self.n_joints = n_joints

    # ------------------------------------------------------------------
    def _axis_angle(self, axis: jax.Array, angle: jax.Array) -> jax.Array:
        K = jnp.array([[0.0, -axis[2], axis[1]],
                       [axis[2], 0.0, -axis[0]],
                       [-axis[1], axis[0], 0.0]])
        return (jnp.eye(3) + jnp.sin(angle) * K
                + (1.0 - jnp.cos(angle)) * (K @ K))

    def _camera(self, key):
        ks, kr, kt = jax.random.split(key, 3)
        s = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
        if self.full_rotation:
            q = jax.random.normal(kr, (4,))
            q = q / jnp.linalg.norm(q)
            a, b, c, d = q
            R = jnp.array([
                [a*a+b*b-c*c-d*d, 2*(b*c-a*d), 2*(b*d+a*c)],
                [2*(b*c+a*d), a*a-b*b+c*c-d*d, 2*(c*d-a*b)],
                [2*(b*d-a*c), 2*(c*d+a*b), a*a-b*b-c*c+d*d]])
        else:
            ky, kp = jax.random.split(kr)
            yaw = jax.random.uniform(ky, (), minval=0.0, maxval=2 * jnp.pi)
            pitch = jax.random.uniform(kp, (), minval=jnp.radians(-75.0),
                                       maxval=jnp.radians(-15.0))
            R = (self._axis_angle(jnp.array([1.0, 0, 0]), pitch)
                 @ self._axis_angle(jnp.array([0.0, 0, 1]), yaw))
        t = jax.random.uniform(kt, (3,), minval=-0.5, maxval=0.5)
        return s, R, t

    def _frame(self, key) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        kstate, kcam, knoise, kperm = jax.random.split(key, 4)
        K = self.n_parts

        # articulation: per part rotation+translation in canonical frame
        partR = [jnp.eye(3)]
        partT = [jnp.zeros(3)]
        states = jax.random.uniform(kstate, (max(self.n_joints, 1),),
                                    minval=-1.2, maxval=1.2)
        for j in range(1, K):
            k = j - 1
            jt = self.joint_type[k]
            if jt == 0:      # revolute about (pos, axis)
                R = self._axis_angle(self.joint_axis[k], states[k])
                t = self.joint_pos[k] - R @ self.joint_pos[k]
            elif jt == 1:    # prismatic
                R = jnp.eye(3)
                t = self.joint_axis[k] * (0.125 * states[k] + 0.15)  # [0,0.3]
            else:
                R, t = jnp.eye(3), jnp.zeros(3)
            partR.append(R)
            partT.append(t)
        partR = jnp.stack(partR)           # (K, 3, 3)
        partT = jnp.stack(partT)           # (K, 3)

        art = jnp.einsum("kij,nj->nki", partR, self.canon) + partT[None]
        art = jnp.take_along_axis(
            art, self.part_of[:, None, None].astype(jnp.int32), axis=1)[:, 0]

        s_cam, R_cam, t_cam = self._camera(kcam)
        pts = s_cam * art @ R_cam.T + t_cam
        if self.noise > 0:
            pts = pts + self.noise * jax.random.normal(knoise, pts.shape)

        sel = jax.random.permutation(kperm, self.n_total)[:self.num_points]
        P = pts[sel] * self.g_factor

        cls = self.part_of[sel].astype(jnp.float32)
        mask = jax.nn.one_hot(self.part_of[sel], K, dtype=jnp.float32)
        sample = {
            "P": P.astype(jnp.float32),
            "cls_gt": cls,
            "mask_array": mask,
            "nocs_gt": self.nocs_p[sel],
            "nocs_gt_g": self.nocs_g[sel],
            "heatmap_gt": self.heat[sel],
            "unitvec_gt": self.unitv[sel],
            "orient_gt": self.orient[sel],
            "joint_cls_gt": self.jcls[sel],
            "joint_cls_mask": (self.jcls[sel] > 0).astype(jnp.float32),
            "joint_params_gt": self.joint_params,
        }

        # GT similarity per part: nocs_p -> input frame
        # X = (nocs - 0.5)/f_j + center_j ; Y = f0*(s_cam R_cam (R_j X + t_j) + t_cam)
        R_gt = jnp.einsum("ij,kjl->kil", R_cam, partR)               # (K,3,3)
        s_gt = self.g_factor * s_cam / self.part_factors             # (K,)
        base = self.part_centers - 0.5 / self.part_factors[:, None]  # (K,3)
        inner = jnp.einsum("kij,kj->ki", partR, base) + partT        # (K,3)
        t_gt = self.g_factor * (s_cam * inner @ R_cam.T + t_cam)     # (K,3)
        gt = {"R": R_gt, "s": s_gt, "t": t_gt}
        return sample, gt

    def sample_batch(self, key, batch_size: int):
        """(batch dict of (B, ...) device arrays, gt dict) — call under jit."""
        keys = jax.random.split(key, batch_size)
        return jax.vmap(self._frame)(keys)


def make_fused_synthetic_train_step(config, device_gen: DeviceSynthetic,
                                    batch_size: int, steps_per_call: int = 1):
    """Train step with on-device data generation fused in: (state, key) ->
    (state, metrics).  No host involvement at all.

    steps_per_call > 1 wraps the step in a lax.scan so one dispatch runs
    many optimizer steps — amortizing per-call latency (~10 steps/s
    through the dev tunnel vs ~500 steps/s on-device).  Returned metrics
    are from the last step of the window.
    """
    from articulated_pose_tpu.train import state as state_lib

    base_step = state_lib.make_train_step(config, jit=False)

    def one(state, key):
        kd, kt = jax.random.split(jax.random.fold_in(key, state.step))
        batch, _ = device_gen.sample_batch(kd, batch_size)
        return base_step(state, batch, kt)

    if steps_per_call == 1:
        return jax.jit(one)

    @jax.jit
    def multi(state, key):
        def body(st, _):
            st, metrics = one(st, key)
            return st, metrics
        state, ms = jax.lax.scan(body, state, None, length=steps_per_call)
        return state, jax.tree.map(lambda a: a[-1], ms)

    return multi
