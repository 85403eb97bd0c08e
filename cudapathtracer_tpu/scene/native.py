"""ctypes loader for the native C++ runtime components (csrc/).

Compiles csrc/*.cpp into a shared library on first use (g++, cached in
build/). Every native entry point has a pure numpy fallback in its Python
caller, so the framework works even without a toolchain; the native path is
the production one for large scenes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_BUILD = os.path.join(_REPO_ROOT, "build")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile_and_load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(_CSRC, "bvh_builder.cpp")
        out = os.path.join(_BUILD, "libtpt_native.so")
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < os.path.getmtime(src)):
                os.makedirs(_BUILD, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", out, src],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(out)
            lib.tpt_build_bvh.restype = ctypes.c_int
            lib.tpt_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # centroids
                ctypes.POINTER(ctypes.c_float),  # amins
                ctypes.POINTER(ctypes.c_float),  # amaxs
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),  # left
                ctypes.POINTER(ctypes.c_int32),  # right
                ctypes.POINTER(ctypes.c_int32),  # axis
                ctypes.POINTER(ctypes.c_int32),  # leaf [M,2]
                ctypes.POINTER(ctypes.c_float),  # bounds [M,6]
                ctypes.POINTER(ctypes.c_int32),  # perm
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _compile_and_load() is not None


def native_build_bvh(centroids: np.ndarray, amins: np.ndarray,
                     amaxs: np.ndarray, max_leaf_size: int):
    """Run the C++ SAH builder. Returns (left, right, axis, leaf, bounds,
    perm) numpy arrays trimmed to the node count, or None if the native
    library is unavailable."""
    lib = _compile_and_load()
    if lib is None:
        return None
    n = centroids.shape[0]
    mmax = 2 * n
    c = np.ascontiguousarray(centroids, np.float32)
    mn = np.ascontiguousarray(amins, np.float32)
    mx = np.ascontiguousarray(amaxs, np.float32)
    left = np.empty(mmax, np.int32)
    right = np.empty(mmax, np.int32)
    axis = np.empty(mmax, np.int32)
    leaf = np.empty((mmax, 2), np.int32)
    bounds = np.empty((mmax, 6), np.float32)
    perm = np.empty(n, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    m = lib.tpt_build_bvh(
        c.ctypes.data_as(fp), mn.ctypes.data_as(fp), mx.ctypes.data_as(fp),
        n, int(max_leaf_size), mmax,
        left.ctypes.data_as(ip), right.ctypes.data_as(ip),
        axis.ctypes.data_as(ip), leaf.ctypes.data_as(ip),
        bounds.ctypes.data_as(fp), perm.ctypes.data_as(ip))
    if m <= 0:
        return None
    return (left[:m].copy(), right[:m].copy(), axis[:m].copy(),
            leaf[:m].copy(), bounds[:m].copy(), perm)
