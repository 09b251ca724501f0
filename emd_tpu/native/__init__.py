"""Native (C++) runtime components, bound via ctypes.

Currently: grid-hash KNN (`knn_query`) — the framework's replacement for
the reference's native KNN dependencies (CUDA simple_knn, open3d KDTree,
sklearn). Compiled on first use with g++ -O3 and cached next to the source;
falls back to scipy cKDTree if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "knn.cpp")
_SO = os.path.join(_HERE, "_knn.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.knn_query.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.knn_query.restype = None
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def knn(points: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbours (excluding self) per point.

    Returns (dists (N, k) float32 ascending, idx (N, k) int32)."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    dists = np.empty((n, k), np.float32)
    idx = np.empty((n, k), np.int32)
    try:
        lib = _load()
    except Exception:
        from scipy.spatial import cKDTree
        d, i = cKDTree(pts).query(pts, k=k + 1, workers=-1)
        return d[:, 1:].astype(np.float32), i[:, 1:].astype(np.int32)
    lib.knn_query(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), ctypes.c_int(k),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return dists, idx
