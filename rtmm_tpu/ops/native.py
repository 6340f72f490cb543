"""ctypes bindings for the native (C++) precompute kernels.

The reference implements its entire host runtime in C++ (framework/src/
mesh.cpp et al.); this module is the equivalent native path for our scene
precompute. It builds `native/librtmm_native.so` on demand (g++, no
external deps) and exposes drop-in replacements for the NumPy versions in
precompute.py; `available()` gates usage so pure-Python environments work
unchanged.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librtmm_native.so"))
_lib = None
_tried = False


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _i64(a):
    return np.ascontiguousarray(a, np.int64)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "rtmm_native.cpp")
    # The .so is never committed (it is built with -march=native, so a blob
    # from another machine could SIGILL); (re)build when missing or stale.
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rtmm_native_version.restype = ctypes.c_int
    if lib.rtmm_native_version() != 1:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def displacement_scales(positions, displacements, present, base_pos,
                        base_dir) -> np.ndarray:
    lib = _load()
    m = positions.shape[0]
    out = np.empty(m, np.float32)
    lib.rtmm_displacement_scales(
        _ptr(_f32(positions)), _ptr(_f32(displacements)),
        _ptr(np.ascontiguousarray(present, np.uint8)), ctypes.c_int64(m),
        _ptr(_f32(base_pos)), _ptr(_f32(base_dir)), _ptr(out))
    return out


def face_node_paths(face_coords, level) -> np.ndarray:
    lib = _load()
    f = face_coords.shape[0]
    out = np.empty((f, level + 1), np.int64)
    lib.rtmm_face_node_paths(_ptr(_i64(face_coords)), ctypes.c_int64(f),
                             ctypes.c_int(level), _ptr(out))
    return out


def node_minmax(paths, fheights, level) -> np.ndarray:
    lib = _load()
    ni = (4**level - 1) // 3
    out = np.empty((ni, 2), np.float32)
    lib.rtmm_node_minmax(_ptr(_i64(paths)), _ptr(_f32(fheights)),
                         ctypes.c_int64(paths.shape[0]),
                         ctypes.c_int(level), _ptr(out))
    return out


def node_deltas(paths, fpts, level, corner2d):
    """Returns (delta (NI,), expanded_verts (NI, 3, 2))."""
    lib = _load()
    ni = (4**level - 1) // 3
    delta = np.empty(ni, np.float32)
    verts = np.empty((ni, 3, 2), np.float32)
    lib.rtmm_node_deltas(_ptr(_i64(paths)), _ptr(_f32(fpts)),
                         ctypes.c_int64(paths.shape[0]),
                         ctypes.c_int(level), _ptr(_f32(corner2d)),
                         _ptr(delta), _ptr(verts))
    return delta, verts
