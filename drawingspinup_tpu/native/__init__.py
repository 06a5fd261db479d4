"""ctypes bindings to the framework's native C++ runtime components
(``native/`` at the repo root). Builds on first use via ``make``; every entry
point has a pure-Python fallback so the framework degrades gracefully when no
toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdsu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-j4"], check=True,
                               capture_output=True, timeout=300)
            except Exception:
                return None
        if os.path.exists(_LIB_PATH):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                f32p = ctypes.POINTER(ctypes.c_float)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                i32p = ctypes.POINTER(ctypes.c_int)
                ci = ctypes.c_int
                lib.dsu_telea_inpaint.argtypes = [f32p, u8p, ci, ci, ci, ci]
                lib.dsu_telea_inpaint.restype = None
                lib.dsu_decimate.argtypes = [f32p, ci, i32p, ci, ci,
                                             f32p, i32p, i32p, i32p]
                lib.dsu_decimate.restype = ci
                lib.dsu_rasterize.argtypes = [f32p, ci, i32p, ci, ci, ci, ci,
                                              f32p, i32p, f32p]
                lib.dsu_rasterize.restype = None
                lib.dsu_raycast_z.argtypes = [f32p, ci, i32p, ci, f32p, ci,
                                              ci, f32p, i32p]
                lib.dsu_raycast_z.restype = None
                i64 = ctypes.c_int64
                i64p = ctypes.POINTER(ctypes.c_int64)
                lib.dsu_gaussian3d.argtypes = [f32p, ci, ctypes.c_float]
                lib.dsu_gaussian3d.restype = None
                lib.dsu_march_tets_run.argtypes = [f32p, ci, ctypes.c_float,
                                                   i64p, i64p]
                lib.dsu_march_tets_run.restype = i64
                lib.dsu_march_tets_fetch.argtypes = [i64, f32p, i32p]
                lib.dsu_march_tets_fetch.restype = None
                u8p = ctypes.POINTER(ctypes.c_uint8)
                lib.dsu_march_tets_run_u8.argtypes = [
                    u8p, ci, ctypes.c_float,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64)]
                lib.dsu_march_tets_run_u8.restype = i64
                lib.dsu_decimate_fast.argtypes = [f32p, ci, i32p, ci, ci,
                                                  f32p, i32p, i32p, i32p]
                lib.dsu_decimate_fast.restype = ci
                _lib = lib
            except (OSError, AttributeError):
                _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def telea_inpaint(img: np.ndarray, mask: np.ndarray, radius: int = 3) -> np.ndarray:
    """Telea inpaint via native C++. img (H,W,C) float32, mask (H,W) nonzero
    = inpaint. Returns a new array."""
    lib = _load()
    assert lib is not None, "native library unavailable; use telea_inpaint_numpy"
    a = np.ascontiguousarray(img, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    out = a.copy()
    m = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    h, w = m.shape
    c = out.shape[2]
    lib.dsu_telea_inpaint(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, int(radius))
    return out if img.ndim == 3 else out[..., 0]


def decimate(verts: np.ndarray, faces: np.ndarray,
             target_faces: int, fast: bool = False):
    """Quadric edge-collapse decimation → (verts, faces). Native only.
    ``fast=True`` runs a deterministic short-edge-collapse pre-pass before
    QEM (native/decimate.cc::prepass_collapse) — same result contract,
    3-5× faster on dense marching-tets meshes."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv = ctypes.c_int(0)
    nf = ctypes.c_int(0)
    fn = lib.dsu_decimate_fast if fast else lib.dsu_decimate
    rc = fn(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(nv), ctypes.byref(nf))
    assert rc == 0
    return out_v[: nv.value].copy(), out_f[: nf.value].astype(np.int64).copy()


def rasterize(verts: np.ndarray, faces: np.ndarray, width: int, height: int,
              z_mode: int = 0):
    """Z-buffer rasterization. verts (V,3) with x,y in pixel coords.
    Returns (depth (H,W), face_id (H,W) int32 −1=bg, bary (H,W,3))."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    depth = np.empty((height, width), np.float32)
    face_id = np.empty((height, width), np.int32)
    bary = np.empty((height, width, 3), np.float32)
    lib.dsu_rasterize(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        width, height, z_mode,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        face_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return depth, face_id, bary


def raycast_z(verts: np.ndarray, faces: np.ndarray, queries: np.ndarray,
              direction: int):
    """±z raycast: queries (Q,3) with x,y in the same coords as verts.
    Returns (hit_z (Q,), hit_face (Q,) int32 −1=miss)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    q = np.ascontiguousarray(queries, np.float32)
    hz = np.empty((len(q),), np.float32)
    hf = np.empty((len(q),), np.int32)
    lib.dsu_raycast_z(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(q),
        int(direction),
        hz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return hz, hf


def gaussian3d(field: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian filter over an (N,N,N) float32 field, matching
    scipy.ndimage.gaussian_filter(mode='reflect', truncate=4.0). In-place on
    a copy; returns the filtered array."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    f = np.ascontiguousarray(field, np.float32).copy()
    n = f.shape[0]
    assert f.shape == (n, n, n)
    lib.dsu_gaussian3d(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(sigma))
    return f


def march_tets(field: np.ndarray, level: float):
    """Marching tetrahedra over an (N,N,N) float32 field at ``level`` —
    native twin of render/marching.marching_tetrahedra (same parity-mirrored
    6-tet decomposition, edge interpolation and gradient-based orientation).
    Returns (verts (V,3) float32 index coords, faces (F,3) int64)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = field.shape[0]
    assert field.shape == (n, n, n)
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    if field.dtype == np.uint8:
        # u8 field marched directly (edge interpolation is affine-
        # invariant; caller passes level in u8 units) — skips a 0.5 GB
        # host f32 materialization on the device-smooth export path
        f = np.ascontiguousarray(field)
        h = lib.dsu_march_tets_run_u8(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            ctypes.c_float(level), ctypes.byref(nv), ctypes.byref(nf))
    else:
        f = np.ascontiguousarray(field, np.float32)
        h = lib.dsu_march_tets_run(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(level), ctypes.byref(nv), ctypes.byref(nf))
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    lib.dsu_march_tets_fetch(
        h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return verts, faces.astype(np.int64)
