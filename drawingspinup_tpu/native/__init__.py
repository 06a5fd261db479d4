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
                lib.dsu_telea_inpaint.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.dsu_telea_inpaint.restype = None
                _lib = lib
            except OSError:
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
