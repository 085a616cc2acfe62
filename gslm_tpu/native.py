"""ctypes loader for the native host-side library (native/gslm_native.cpp).

The native layer plays the role of the reference's host/CUDA utility
extensions — simple-knn's distCUDA2 (scene/gaussian_model.py:249) and the
hot COLMAP binary parse loops — built as a plain shared object with g++
and called via ctypes (no pybind11 in this environment). Everything here
degrades gracefully: if the toolchain or library is unavailable, callers
fall back to the pure JAX/Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "gslm_native.cpp")
_LIB = os.path.join(_ROOT, "native", "build", "libgslm_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """The loaded library, or None when unavailable (no toolchain, etc.)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mean_sq_dist_3nn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.parse_points3d_bin.restype = ctypes.c_int64
        lib.parse_points3d_bin.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray | None:
    """Exact 3-NN mean squared distance; None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(len(pts), dtype=np.float32)
    lib.mean_sq_dist_3nn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def parse_points3d_bin(path: str):
    """(xyz, rgb, err) from points3D.bin; None if unavailable/malformed."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    n = lib.parse_points3d_bin(buf, len(buf), None, None, None, None)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    ids = np.empty(n, np.int64)
    got = lib.parse_points3d_bin(
        buf, len(buf), xyz.ctypes.data, rgb.ctypes.data, err.ctypes.data,
        ids.ctypes.data)
    if got != n:
        return None
    return xyz, rgb, err
