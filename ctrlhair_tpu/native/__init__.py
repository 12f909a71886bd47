# Native (C++) components, loaded in-process via ctypes.
#
# The reference shells out to prebuilt binaries with file-based I/O
# (`triangle`, `my_arap`; ref: triangle_wrap_hair.py:59-64,
# generate_node.py:75-78).  Here the native code is a shared library built
# from source in this package and called through ctypes — zero subprocesses,
# zero temp files.

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libctrlhair_native.so')
_lock = threading.Lock()
_lib = None
_build_failed = False


def build_native(force: bool = False) -> bool:
    """Compile the native library with g++ (rebuilds when the source is
    newer than the built library). Returns True on success."""
    global _build_failed
    srcs = [os.path.join(_DIR, 'arap.cpp'),
            os.path.join(_DIR, 'raster.cpp')]
    if os.path.exists(_LIB_PATH) and not force:
        try:
            lib_m = os.path.getmtime(_LIB_PATH)
            if all(lib_m >= os.path.getmtime(s) for s in srcs):
                return True
        except OSError:     # source missing: keep the existing binary
            return True
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB_PATH] + srcs,
            check=True, capture_output=True, timeout=120)
        _build_failed = False   # clear the latch on a successful (re)build
        return True
    except Exception:
        _build_failed = True
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # build_native is a cheap mtime check when the lib is fresh, and
        # rebuilds when arap.cpp is newer — so the runtime path never loads
        # a stale binary after a source change
        if not build_native():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind_symbols(lib)
        except (OSError, AttributeError):
            # AttributeError: a kept binary predating one of the entry
            # points (e.g. built before raster.cpp existed).  Force one
            # rebuild from current sources; on any failure keep the
            # documented None-fallback contract instead of crashing.
            if not build_native(force=True):
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                _bind_symbols(lib)
            except (OSError, AttributeError):
                return None
        _lib = lib
        return _lib


def _bind_symbols(lib) -> None:
    lib.arap_solve_2d.restype = ctypes.c_int
    lib.arap_solve_2d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.rasterize_warp_composite.restype = ctypes.c_int
    lib.rasterize_warp_composite.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]


def rasterize_warp_composite(verts_dst: np.ndarray, tris: np.ndarray,
                             uv: np.ndarray, total: np.ndarray,
                             face_parsing: np.ndarray, pad: int,
                             hair_idx: int, unknown_label: int,
                             out_size: int = 0) -> np.ndarray | None:
    """Host rasterize+sample+composite for one warp (see raster.cpp).

    Returns the composite parsing, or None if the native lib is missing.
    """
    lib = _load()
    if lib is None:
        return None
    big = total.shape[0]
    size = face_parsing.shape[0]
    if big != size + 2 * pad:
        return None
    v = np.ascontiguousarray(verts_dst, np.float64)
    t = np.ascontiguousarray(tris, np.int32)
    u = np.ascontiguousarray(uv, np.float64)
    tot = np.ascontiguousarray(total, np.float32)
    face = np.ascontiguousarray(face_parsing, np.int32)
    if v.ndim != 2 or v.shape[1] != 2 or u.shape != v.shape \
            or t.ndim != 2 or t.shape[1] != 3:
        return None
    # the one place the output grid is chosen; C validates divisibility
    # and writes exactly [out_n, out_n]
    out_n = (out_size if out_size and out_size != size
             and size % out_size == 0 else size)
    out = np.empty((out_n, out_n), np.int32)
    ret = lib.rasterize_warp_composite(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(t),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), big,
        face.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), size,
        int(pad), int(hair_idx), int(unknown_label), int(out_n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if ret != 0:
        return None
    return out


def arap_solve(verts: np.ndarray, tris: np.ndarray,
               constrained_idx: np.ndarray, constrained_pos: np.ndarray,
               iterations: int = 100) -> np.ndarray | None:
    """2-D ARAP deformation; returns deformed [V,2] or None if unavailable.

    iterations=100 matches the reference (my_arap.cpp:183).
    """
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    t = np.ascontiguousarray(tris, np.int32)
    ci = np.ascontiguousarray(constrained_idx, np.int32)
    cp = np.ascontiguousarray(constrained_pos, np.float64)
    if v.ndim != 2 or v.shape[1] != 2 or cp.shape != (len(ci), 2):
        # the C side reads constrained_pos[2*c..] for every index — a
        # shape mismatch would be an out-of-bounds native read
        return None
    out = np.empty_like(v)
    ret = lib.arap_solve_2d(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(t),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(ci),
        cp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(iterations),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if ret != 0:
        return None
    return out
