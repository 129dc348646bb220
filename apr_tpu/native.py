"""ctypes bindings for the native host-geometry library (native/geometry.cpp).

Compiles the shared library on first use (cached next to the sources) and
falls back to numpy implementations when no compiler is available.  These
back the HOST side of the pipeline (raw-scan pre-reduction before padding,
neighbor calibration, offline ICP); the training hot path uses the on-device
equivalents in apr_tpu.ops.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaprgeom.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "geometry.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native build failed, using numpy fallbacks: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.apr_grid_subsample.restype = ctypes.c_int32
    lib.apr_grid_subsample.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int32,
        f32p, ctypes.c_void_p, ctypes.c_int32,
    ]
    lib.apr_voxel_dedup.restype = ctypes.c_int32
    lib.apr_voxel_dedup.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_float, i32p, ctypes.c_int32,
    ]
    lib.apr_radius_neighbors.restype = None
    lib.apr_radius_neighbors.argtypes = [
        f32p, ctypes.c_int32, f32p, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, i32p,
    ]
    _lib = lib
    return _lib


def grid_subsample(
    points: np.ndarray, voxel: float, capacity: Optional[int] = None,
    features: Optional[np.ndarray] = None,
):
    """Barycenter voxel subsample; returns (points [nv,3], features or None)."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    capacity = capacity or n
    lib = get_lib()
    if lib is not None:
        out = np.zeros((capacity, 3), np.float32)
        if features is not None:
            features = np.ascontiguousarray(features, np.float32)
            fdim = features.shape[1]
            fout = np.zeros((capacity, fdim), np.float32)
            nv = lib.apr_grid_subsample(
                points, n, voxel,
                features.ctypes.data_as(ctypes.c_void_p), fdim,
                out, fout.ctypes.data_as(ctypes.c_void_p), capacity,
            )
            return out[:nv], fout[:nv]
        nv = lib.apr_grid_subsample(points, n, voxel, None, 0, out, None,
                                    capacity)
        return out[:nv], None
    # numpy fallback
    coords = np.floor(points / voxel).astype(np.int64)
    _, inv, cnt = np.unique(
        coords, axis=0, return_inverse=True, return_counts=True
    )
    nv = min(len(cnt), capacity)
    acc = np.zeros((len(cnt), 3), np.float64)
    np.add.at(acc, inv, points)
    bary = (acc / cnt[:, None]).astype(np.float32)[:nv]
    if features is None:
        return bary, None
    facc = np.zeros((len(cnt), features.shape[1]), np.float64)
    np.add.at(facc, inv, features)
    return bary, (facc / cnt[:, None]).astype(np.float32)[:nv]


def voxel_dedup(points: np.ndarray, voxel: float,
                capacity: Optional[int] = None) -> np.ndarray:
    """First-point-per-voxel selection indices (ME sparse_quantize parity)."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    capacity = capacity or n
    lib = get_lib()
    if lib is not None:
        sel = np.zeros(capacity, np.int32)
        nv = lib.apr_voxel_dedup(points, n, voxel, sel, capacity)
        return sel[:nv]
    coords = np.floor(points / voxel).astype(np.int64)
    _, sel = np.unique(coords, axis=0, return_index=True)
    return np.sort(sel)[:capacity].astype(np.int32)


def radius_neighbors(
    queries: np.ndarray, supports: np.ndarray, radius: float, cap: int
) -> np.ndarray:
    """Distance-sorted capped radius neighbors, sentinel = len(supports)."""
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    nq, ns = len(queries), len(supports)
    lib = get_lib()
    if lib is not None:
        out = np.empty((nq, cap), np.int32)
        lib.apr_radius_neighbors(queries, nq, supports, ns, radius, cap, out)
        return out
    from scipy.spatial import cKDTree

    tree = cKDTree(supports)
    out = np.full((nq, cap), ns, np.int32)
    dists, idxs = tree.query(
        queries, k=cap, distance_upper_bound=radius
    )
    if cap == 1:
        dists, idxs = dists[:, None], idxs[:, None]
    valid = np.isfinite(dists)
    out[valid] = idxs[valid]
    return out
