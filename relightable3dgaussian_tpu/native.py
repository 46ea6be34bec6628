"""ctypes bindings for the native C++ runtime helpers (`native/`).

Auto-builds `libr3dg_native.so` with the system g++ on first use (the
reference JIT-compiles its CUDA extension the same way,
`gaussian_renderer/r3dg_rasterization.py:7-25`); every entry point has a
pure-Python fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libr3dg_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "r3dg_native.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.r3dg_mean_knn_dist2.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.r3dg_ply_read_f32.restype = ctypes.c_int64
        lib.r3dg_ply_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def mean_knn_dist2(points: np.ndarray, k: int = 3, window: int = 128
                   ) -> np.ndarray | None:
    """Multithreaded morton-windowed KNN (None → caller falls back to
    the jnp implementation in `ops.knn`)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.zeros(len(pts), np.float32)
    lib.r3dg_mean_knn_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts), k, window,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def ply_read_columns(path: str, names: list[str]) -> np.ndarray | None:
    """Read named float columns from a binary PLY as [n, len(names)]."""
    lib = _load()
    if lib is None:
        return None
    cnames = (ctypes.c_char_p * len(names))(
        *[n.encode() for n in names])
    n = lib.r3dg_ply_read_f32(path.encode(), cnames, len(names), None, 0)
    if n < 0:
        return None
    out = np.zeros((n, len(names)), np.float32)
    got = lib.r3dg_ply_read_f32(
        path.encode(), cnames, len(names),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got != n:
        return None
    return out
