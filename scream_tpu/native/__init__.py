"""ctypes bindings for the native host-ops library (pointops.cpp).

The reference's host-side geometry ran in Open3D's C++ (voxel downsample,
KD-tree radius search — SURVEY.md §2.6); this package is the framework's own
native equivalent for the host paths (offline preprocessing, raw-data
parsing). On-device equivalents live in `scream_tpu/ops/` as XLA/Pallas
kernels.

The shared library builds on first import with g++ (cached next to the
source); every entry point has a pure-numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pointops.cpp")
_LIB = os.path.join(_DIR, "libpointops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain absent or build failure -> numpy path
        print(f"[scream_tpu.native] build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        print(f"[scream_tpu.native] load failed ({e}); using numpy fallback",
              file=sys.stderr)
        return None

    c_d = ctypes.POINTER(ctypes.c_double)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)

    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [c_d, ctypes.c_int64, ctypes.c_double, c_d]
    lib.radius_has_neighbor.restype = None
    lib.radius_has_neighbor.argtypes = [c_d, ctypes.c_int64, c_d, ctypes.c_int64,
                                        ctypes.c_double, c_u8]
    lib.radius_count.restype = None
    lib.radius_count.argtypes = [c_d, ctypes.c_int64, c_d, ctypes.c_int64,
                                 ctypes.c_double, c_i32]
    lib.highest_in_radius_2d.restype = None
    lib.highest_in_radius_2d.argtypes = [c_d, ctypes.c_int64, c_d, ctypes.c_int64,
                                         ctypes.c_double, c_i32]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.float64)


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Centroid-per-voxel downsample, key-ordered (native or numpy)."""
    lib = _load()
    if lib is None:
        from scream_tpu.ops.voxel import voxel_downsample_np

        return voxel_downsample_np(points, voxel_size)
    pts = _as_c(points)
    out = np.empty_like(pts)
    n = lib.voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        float(voxel_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out[:n].astype(np.float32)


def radius_has_neighbor(query: np.ndarray, ref: np.ndarray, radius: float) -> np.ndarray:
    """Boolean per query point: any ref point within radius."""
    lib = _load()
    q = _as_c(query)
    r = _as_c(ref)
    if lib is None:
        from scipy.spatial import cKDTree

        if len(r) == 0:
            return np.zeros(len(q), dtype=bool)
        # query_ball_point is inclusive at the radius, matching the native
        # dist2 <= r*r (pointops.cpp) and Open3D search_radius_vector_3d
        # (/root/reference/utils.py:99); cKDTree.query's
        # distance_upper_bound would be exclusive at the bound.
        counts = cKDTree(r).query_ball_point(q, radius, return_length=True)
        return np.asarray(counts) > 0
    out = np.empty(len(q), dtype=np.uint8)
    lib.radius_has_neighbor(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(r),
        float(radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def radius_count(query: np.ndarray, ref: np.ndarray, radius: float) -> np.ndarray:
    lib = _load()
    q = _as_c(query)
    r = _as_c(ref)
    if lib is None:
        from scipy.spatial import cKDTree

        if len(r) == 0:
            return np.zeros(len(q), dtype=np.int32)
        tree = cKDTree(r)
        return np.asarray(
            [len(x) for x in tree.query_ball_point(q, radius)], dtype=np.int32
        )
    out = np.empty(len(q), dtype=np.int32)
    lib.radius_count(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(r),
        float(radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def highest_in_radius_2d(query: np.ndarray, ref: np.ndarray, radius: float) -> np.ndarray:
    """Index of the highest-z ref point within 2-D radius per query (-1 if none)."""
    lib = _load()
    q = _as_c(query)
    r = _as_c(ref)
    if lib is None:
        from scipy.spatial import cKDTree

        out = np.full(len(q), -1, dtype=np.int32)
        if len(r) == 0:
            return out
        tree = cKDTree(r[:, :2])
        for i, nbrs in enumerate(tree.query_ball_point(q[:, :2], radius)):
            if nbrs:
                # Sorted so equal-height ties pick the lowest index — the
                # same deterministic rule as the native path (pointops.cpp
                # highest_in_radius_2d), keeping preprocessing output
                # toolchain-independent.
                nbrs = sorted(nbrs)
                out[i] = nbrs[int(np.argmax(r[nbrs, 2]))]
        return out
    out = np.empty(len(q), dtype=np.int32)
    lib.highest_in_radius_2d(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(r),
        float(radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
