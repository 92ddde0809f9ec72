"""ctypes bindings to the native (C++) labeling fast path.

Builds libancsh_native.so on first use (plain `make`, no pip deps) and
exposes `build_labels_native` with the exact interface/semantics of
data.labeling.build_sample's inner math.  Falls back gracefully: callers
check `available()` and use the NumPy path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libancsh_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        srcs = [os.path.join(_DIR, f) for f in os.listdir(_DIR)
                if f.endswith(".cpp")]
        stale = (not os.path.exists(_SO)
                 or any(os.path.getmtime(s) > os.path.getmtime(_SO)
                        for s in srcs))
        if stale:
            try:
                subprocess.run(["make", "-C", _DIR, "-B"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                if not os.path.exists(_SO):
                    _build_failed = True
                    return None
                import warnings
                warnings.warn(
                    f"native rebuild failed; loading stale {_SO} built "
                    "before the latest source edits", RuntimeWarning)
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        c_f32 = ctypes.POINTER(ctypes.c_float)
        c_f64 = ctypes.POINTER(ctypes.c_double)
        c_i32 = ctypes.POINTER(ctypes.c_int32)
        lib.ancsh_build_labels.restype = ctypes.c_int
        lib.ancsh_build_labels.argtypes = [
            c_f32, c_f32, c_i32, ctypes.c_int32, ctypes.c_int32,
            c_f64, c_f64,
            c_f64, c_f64, c_i32, c_i32, c_i32, ctypes.c_int32,
            ctypes.c_double, c_i32, ctypes.c_int32, ctypes.c_int32,
            c_f32, c_f32, c_f32, c_f32, c_f32,
            c_f32, c_f32, c_f32, c_f32, c_f32, c_f32,
        ]
        if hasattr(lib, "ancsh_render_balls"):
            c_u8 = ctypes.POINTER(ctypes.c_uint8)
            lib.ancsh_render_balls.restype = ctypes.c_int
            lib.ancsh_render_balls.argtypes = [
                ctypes.c_int32, ctypes.c_int32, c_u8, ctypes.c_int32,
                c_i32, c_f32, c_f32, c_f32, ctypes.c_int32,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_JT = {"revolute": 0, "prismatic": 1, "fixed": 2}


def build_labels_native(parts_pts: Sequence[np.ndarray],
                        parts_canon: Sequence[np.ndarray],
                        joints, norm, *, num_points: int,
                        n_max_parts: int, thres_r: float = 0.2,
                        sel: Optional[np.ndarray] = None,
                        rng: Optional[np.random.RandomState] = None
                        ) -> Dict[str, np.ndarray]:
    """C++ twin of labeling.build_sample (nocs_type='AC' layout)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n_parts = len(parts_pts)
    pts = np.ascontiguousarray(np.concatenate(parts_pts, 0), np.float32)
    canon = np.ascontiguousarray(np.concatenate(parts_canon, 0), np.float32)
    part_of = np.concatenate([np.full(len(p), j, np.int32)
                              for j, p in enumerate(parts_pts)])
    n_total = pts.shape[0]
    corners = np.ascontiguousarray(
        np.stack([np.asarray(c, np.float64) for c in norm.corners]), np.float64)
    factors = np.ascontiguousarray(np.asarray(norm.factors, np.float64))
    n_joints = len(joints)
    jpos = np.ascontiguousarray(
        np.stack([np.asarray(j.position, np.float64).reshape(3) for j in joints])
        if n_joints else np.zeros((0, 3)))
    jaxis = np.ascontiguousarray(
        np.stack([np.asarray(j.axis, np.float64).reshape(3) for j in joints])
        if n_joints else np.zeros((0, 3)))
    jparent = np.asarray([j.parent for j in joints], np.int32)
    jchild = np.asarray([j.child for j in joints], np.int32)
    jtype = np.asarray([_JT[j.jtype] for j in joints], np.int32)

    if sel is None:
        rng = rng or np.random.RandomState(0)
        if n_total < num_points:
            tile_n = num_points // n_total + 1
            sel = rng.permutation(tile_n * n_total)[:num_points]
        else:
            sel = rng.permutation(n_total)[:num_points]
    sel = np.ascontiguousarray(sel, np.int32)

    P = np.empty((num_points, 3), np.float32)
    cls = np.empty((num_points,), np.float32)
    mask = np.empty((num_points, n_max_parts), np.float32)
    nocs = np.empty((num_points, 3), np.float32)
    nocs_g = np.empty((num_points, 3), np.float32)
    heat = np.empty((num_points,), np.float32)
    unitv = np.empty((num_points, 3), np.float32)
    orient = np.empty((num_points, 3), np.float32)
    jcls = np.empty((num_points,), np.float32)
    jmask = np.empty((num_points,), np.float32)
    jparams = np.empty((n_max_parts, 7), np.float32)

    def fp32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def fp64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def ip32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.ancsh_build_labels(
        fp32(pts), fp32(canon), ip32(part_of),
        np.int32(n_total), np.int32(n_parts),
        fp64(corners), fp64(factors),
        fp64(jpos), fp64(jaxis), ip32(jparent), ip32(jchild), ip32(jtype),
        np.int32(n_joints), ctypes.c_double(thres_r),
        ip32(sel), np.int32(num_points), np.int32(n_max_parts),
        fp32(P), fp32(cls), fp32(mask), fp32(nocs), fp32(nocs_g),
        fp32(heat), fp32(unitv), fp32(orient), fp32(jcls), fp32(jmask),
        fp32(jparams))
    assert rc == 0, f"native labeling failed rc={rc}"
    return {
        "P": P, "cls_gt": cls, "mask_array": mask, "nocs_gt": nocs,
        "nocs_gt_g": nocs_g, "heatmap_gt": heat, "unitvec_gt": unitv,
        "orient_gt": orient, "joint_cls_gt": jcls, "joint_cls_mask": jmask,
        "joint_params_gt": jparams,
    }


def render_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ancsh_render_balls")


def render_balls_native(image: np.ndarray, xyz: np.ndarray,
                        colors: np.ndarray, ballradius: int) -> None:
    """Z-buffered sphere splatting into `image` (H,W,3 uint8), in place.

    xyz is (N,3) int32 screen coords (row, col, depth; larger depth is
    closer); colors is (N,3) float32 in [0,255].  Native twin of
    utils.ball_viewer._render_balls_numpy; the reference shipped this
    stage only as a prebuilt binary (show3d_balls.py:23).
    """
    lib = _load()
    assert lib is not None and hasattr(lib, "ancsh_render_balls")
    assert image.dtype == np.uint8 and image.ndim == 3 and image.shape[2] == 3
    xyz = np.ascontiguousarray(xyz, np.int32)
    r = np.ascontiguousarray(colors[:, 0], np.float32)
    g = np.ascontiguousarray(colors[:, 1], np.float32)
    b = np.ascontiguousarray(colors[:, 2], np.float32)
    assert image.flags.c_contiguous
    rc = lib.ancsh_render_balls(
        np.int32(image.shape[0]), np.int32(image.shape[1]),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(xyz.shape[0]),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(ballradius))
    assert rc == 0, f"native ball render failed rc={rc}"
