"""ctypes bindings for the native host-side geometry kernels (native/nf_native.cc).

The shared library is built lazily with g++ on first use and cached next to
the source. Consumers should go through `utils.metrics` / these wrappers,
which fall back to scipy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO, "native", "nf_native.cc")
_LIB = osp.join(_REPO, "native", "libnf_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load(rebuild: bool = False):
    """Load (building if needed) the native library; returns None on failure."""
    global _lib
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        try:
            if rebuild or not osp.exists(_LIB) or (
                osp.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.nf_nearest_neighbors.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, f32p, i32p,
        ]
        lib.nf_nearest_neighbors.restype = None
        lib.nf_chamfer.argtypes = [f32p, ctypes.c_int32, f32p, ctypes.c_int32]
        lib.nf_chamfer.restype = ctypes.c_float
        lib.nf_radius_counts.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_float,
            ctypes.c_int32, i32p,
        ]
        lib.nf_radius_counts.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _as_f32(x):
    return np.ascontiguousarray(np.asarray(x, np.float32))


def nearest_neighbor_distances(points, queries):
    """Distance from each query to its nearest point (+ indices)."""
    lib = load()
    points = _as_f32(points)
    queries = _as_f32(queries)
    if lib is None:
        from scipy.spatial import cKDTree

        d, i = cKDTree(points).query(queries)
        return d.astype(np.float32), i.astype(np.int32)
    out_d = np.empty(len(queries), np.float32)
    out_i = np.empty(len(queries), np.int32)
    lib.nf_nearest_neighbors(points, len(points), queries, len(queries), out_d, out_i)
    return out_d, out_i


def chamfer(x, y) -> float:
    lib = load()
    x, y = _as_f32(x), _as_f32(y)
    if lib is None:
        from neurofluid_tpu.utils.metrics import chamfer_distance_np

        return chamfer_distance_np(x, y)
    return float(lib.nf_chamfer(x, len(x), y, len(y)))


def radius_counts(points, queries, radius, exclude_self=False):
    lib = load()
    points, queries = _as_f32(points), _as_f32(queries)
    if lib is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(points)
        counts = np.asarray(
            [len(tree.query_ball_point(q, radius)) for q in queries], np.int32
        )
        if exclude_self:
            d, _ = tree.query(queries)
            counts -= (d == 0).astype(np.int32)
        return counts
    out = np.empty(len(queries), np.int32)
    lib.nf_radius_counts(
        points, len(points), queries, len(queries), float(radius),
        int(exclude_self), out,
    )
    return out
