"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 in this environment); the shared
object is cached next to the sources. Falls back cleanly: callers catch
failures and use the numpy implementations (e.g. extract/meshproc's
vertex-clustering decimator).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtopiaxl_native.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    src = os.path.join(_DIR, "qem.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_DIR, "qem.cpp")
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.qem_decimate.restype = ctypes.c_int
        lib.qem_decimate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
        return lib


def qem_decimate(verts: np.ndarray, faces: np.ndarray, target: int):
    """Quadric edge-collapse decimation to <= target faces."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv_out = ctypes.c_int64(0)
    nf_out = ctypes.c_int64(0)
    rc = lib.qem_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        int(target),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nv_out),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nf_out),
    )
    if rc != 0:
        raise RuntimeError(f"qem_decimate failed rc={rc}")
    return (out_v[: nv_out.value].copy(), out_f[: nf_out.value].copy())
