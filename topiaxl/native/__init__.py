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


_SOURCES = ["qem.cpp", "mt.cpp", "mc.cpp", "raster.cpp", "remesh.cpp",
            "charts.cpp", "edt.cpp"]


def _build() -> None:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src_mtime = max(
            os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES
        )
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
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
        lib.mt_extract.restype = ctypes.c_int
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mc_extract.restype = ctypes.c_int
        lib.mc_extract.argtypes = list(lib.mt_extract.argtypes)
        lib.raster_uv.restype = None
        lib.raster_uv.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.chart_segment.restype = ctypes.c_int
        lib.chart_segment.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.edt_index.restype = ctypes.c_int
        lib.edt_index.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.isotropic_remesh.restype = ctypes.c_int
        lib.isotropic_remesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
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


def _iso_extract(fn_name: str, grid: np.ndarray, iso: float,
                 est_tris: int | None):
    lib = _load()
    fn = getattr(lib, fn_name)
    g = np.ascontiguousarray(grid, np.float32)
    R0, R1, R2 = g.shape
    if est_tris is None:
        est_tris = max(int(4 * R0 * R1), 1 << 16) * 16
    cap_f = est_tris
    cap_v = est_tris  # welded verts < tris in practice
    for _ in range(4):
        out_v = np.empty((cap_v, 3), np.float32)
        out_f = np.empty((cap_f, 3), np.int64)
        nv = ctypes.c_int64(0)
        nf = ctypes.c_int64(0)
        rc = fn(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            R0, R1, R2, ctypes.c_float(iso),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap_v,
            out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap_f,
            ctypes.byref(nv), ctypes.byref(nf),
        )
        if rc == 0:
            return (out_v[: nv.value].copy(), out_f[: nf.value].copy())
        cap_v = max(nv.value, cap_v * 2)
        cap_f = max(nf.value, cap_f * 2)
    raise RuntimeError(f"{fn_name} capacity negotiation failed")


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0,
                        est_tris: int | None = None):
    """Native MT isosurface; returns (verts [V,3] index coords, faces)."""
    return _iso_extract("mt_extract", grid, iso, est_tris)


def marching_cubes(grid: np.ndarray, iso: float = 0.0,
                   est_tris: int | None = None):
    """Native table-based marching cubes (reference-compatible geometry:
    same edge-crossing vertices as PyMCubes, inference.py:119)."""
    return _iso_extract("mc_extract", grid, iso, est_tris)


def raster_uv(uv_corners: np.ndarray, attr_corners: np.ndarray,
              height: int, width: int):
    """Native UV-atlas rasterization: (attr_map [H,W,A] f32, mask [H,W])."""
    lib = _load()
    uv = np.ascontiguousarray(uv_corners, np.float32)
    attr = np.ascontiguousarray(attr_corners, np.float32)
    F = uv.shape[0]
    A = attr.shape[-1]
    out = np.zeros((height * width, A), np.float32)
    cov = np.zeros(height * width, np.uint8)
    lib.raster_uv(
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        attr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        F, A, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cov.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(height, width, A), cov.reshape(height, width).astype(bool)


def chart_segment(face_normals: np.ndarray, indptr: np.ndarray,
                  indices: np.ndarray, cos_t: float,
                  max_faces: int) -> np.ndarray:
    """Normal-cone region-growing chart labels (same traversal as the
    Python spec in extract/lscm.py:segment_charts). Returns [F] int64."""
    lib = _load()
    fn = np.ascontiguousarray(face_normals, np.float32)
    ip = np.ascontiguousarray(indptr, np.int64)
    ix = np.ascontiguousarray(indices, np.int64)
    F = len(fn)
    labels = np.empty(F, np.int64)
    rc = lib.chart_segment(
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ip.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ix.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        F, float(cos_t), int(max_faces),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"chart_segment failed rc={rc}")
    return labels


def edt_index(sites: np.ndarray):
    """Exact squared EDT + nearest-site flat indices for a bool [H, W]
    site mask. Returns (d2 int32 [H, W], idx int32 [H, W])."""
    lib = _load()
    s = np.ascontiguousarray(sites, np.uint8)
    H, W = s.shape
    d2 = np.empty((H, W), np.int32)
    idx = np.empty((H, W), np.int32)
    rc = lib.edt_index(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError("edt_index: empty site mask")
    return d2, idx


def isotropic_remesh(verts: np.ndarray, faces: np.ndarray,
                     target_len: float, iterations: int = 3):
    """Isotropic explicit remeshing (native); returns (verts, faces)."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    cap_v = max(len(v) * 4, 1 << 14)
    cap_f = max(len(f) * 4, 1 << 14)
    for _ in range(4):
        out_v = np.empty((cap_v, 3), np.float32)
        out_f = np.empty((cap_f, 3), np.int64)
        nv = ctypes.c_int64(0)
        nf = ctypes.c_int64(0)
        rc = lib.isotropic_remesh(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
            ctypes.c_float(target_len), int(iterations),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap_v,
            out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap_f,
            ctypes.byref(nv), ctypes.byref(nf),
        )
        if rc == 0:
            return (out_v[: nv.value].copy(), out_f[: nf.value].copy())
        cap_v = max(nv.value, cap_v * 2)
        cap_f = max(nf.value, cap_f * 2)
    raise RuntimeError("isotropic_remesh capacity negotiation failed")
