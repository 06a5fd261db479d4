"""Telea fast-marching inpainting — native reimplementation.

The reference calls OpenCV's C++ ``cv2.inpaint(..., cv2.INPAINT_TELEA)``
(``1_lama_contour_remover/predict.py:64``). This module provides the same
capability without OpenCV: a C++ implementation in ``native/`` (loaded via
ctypes) with a pure-numpy fallback of the identical algorithm.

Algorithm (Telea 2004, "An Image Inpainting Technique Based on the Fast
Marching Method"): march the inpaint front inward in order of distance T from
the region boundary (eikonal |∇T| = 1 solved upwind), filling each pixel from
its already-known radius-ε neighborhood with weights
w = dir · dst · lev (direction, distance, level-set proximity).
"""
from __future__ import annotations

import heapq
from typing import Optional, Tuple

import numpy as np

_KNOWN, _BAND, _INSIDE = 0, 1, 2
_INF = 1e6


def _solve_eikonal(y1: int, x1: int, y2: int, x2: int, h: int, w: int,
                   T: np.ndarray, flags: np.ndarray) -> float:
    """Upwind quadratic solve of |∇T|=1 from two candidate neighbors."""
    if 0 <= y1 < h and 0 <= x1 < w and flags[y1, x1] != _INSIDE:
        t1 = T[y1, x1]
    else:
        t1 = _INF
    if 0 <= y2 < h and 0 <= x2 < w and flags[y2, x2] != _INSIDE:
        t2 = T[y2, x2]
    else:
        t2 = _INF
    if t1 > t2:
        t1, t2 = t2, t1
    if t1 >= _INF:
        return _INF
    if t2 - t1 >= 1.0:
        return t1 + 1.0
    d = 2.0 - (t1 - t2) ** 2
    if d <= 0:
        return _INF
    return 0.5 * (t1 + t2 + np.sqrt(d))


def telea_inpaint_numpy(img: np.ndarray, mask: np.ndarray,
                        radius: int = 3) -> np.ndarray:
    """img: (H,W,C) float32; mask: (H,W) bool/uint8, nonzero = inpaint.
    Returns inpainted copy. Pure-numpy reference implementation; the C++
    version in native/ is the fast path (see ops.inpaint.telea_inpaint)."""
    h, w = mask.shape
    img = np.asarray(img, np.float32).copy()
    if img.ndim == 2:
        img = img[..., None]
    inside = np.asarray(mask) != 0

    flags = np.where(inside, _INSIDE, _KNOWN).astype(np.uint8)
    T = np.where(inside, _INF, 0.0).astype(np.float64)

    # initial narrow band: known pixels bordering the inside region
    band_mask = np.zeros_like(inside)
    band_mask[1:, :] |= inside[:-1, :]
    band_mask[:-1, :] |= inside[1:, :]
    band_mask[:, 1:] |= inside[:, :-1]
    band_mask[:, :-1] |= inside[:, 1:]
    band_mask &= ~inside
    heap = [(0.0, int(y), int(x)) for y, x in zip(*np.nonzero(band_mask))]
    flags[band_mask] = _BAND
    heapq.heapify(heap)

    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    # neighborhood offsets within radius for the fill step
    r = int(radius)
    nb = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)
          if dy * dy + dx * dx <= r * r and (dy or dx)]
    nb = np.array(nb)  # (K,2)

    grad_kernel_eps = 1e-6

    while heap:
        t_cur, y, x = heapq.heappop(heap)
        if flags[y, x] == _KNOWN:
            continue
        flags[y, x] = _KNOWN
        for dy, dx in offs:
            qy, qx = y + dy, x + dx
            if not (0 <= qy < h and 0 <= qx < w) or flags[qy, qx] != _INSIDE:
                continue
            # eikonal update from the four axis-pairs
            tq = min(
                _solve_eikonal(qy - 1, qx, qy, qx - 1, h, w, T, flags),
                _solve_eikonal(qy + 1, qx, qy, qx + 1, h, w, T, flags),
                _solve_eikonal(qy - 1, qx, qy, qx + 1, h, w, T, flags),
                _solve_eikonal(qy + 1, qx, qy, qx - 1, h, w, T, flags),
            )
            T[qy, qx] = tq

            # inpaint q from known neighbors in radius
            ys = qy + nb[:, 0]
            xs = qx + nb[:, 1]
            ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
            ys, xs = ys[ok], xs[ok]
            known = flags[ys, xs] == _KNOWN
            ys, xs = ys[known], xs[known]
            if ys.size:
                vy = (qy - ys).astype(np.float64)
                vx = (qx - xs).astype(np.float64)
                dist2 = vy * vy + vx * vx
                # dir: alignment of (q-p) with ∇T(q); approximate ∇T upwind
                gy = _grad_t(T, flags, qy, qx, 0, h, w)
                gx = _grad_t(T, flags, qy, qx, 1, h, w)
                direc = np.abs(vy * gy + vx * gx) / (np.sqrt(dist2) + grad_kernel_eps)
                direc = np.where(direc < grad_kernel_eps, grad_kernel_eps, direc)
                dst = 1.0 / (dist2 * np.sqrt(dist2) + grad_kernel_eps)
                lev = 1.0 / (1.0 + np.abs(T[ys, xs] - tq))
                wgt = direc * dst * lev
                img[qy, qx] = (wgt[:, None] * img[ys, xs]).sum(0) / wgt.sum()

            flags[qy, qx] = _BAND
            heapq.heappush(heap, (float(tq), int(qy), int(qx)))

    return img


def _grad_t(T: np.ndarray, flags: np.ndarray, y: int, x: int, axis: int,
            h: int, w: int) -> float:
    """One-sided/central gradient of T at (y,x) using non-INSIDE neighbors."""
    if axis == 0:
        lo, hi = (y - 1, x), (y + 1, x)
    else:
        lo, hi = (y, x - 1), (y, x + 1)
    has_lo = 0 <= lo[0] < h and 0 <= lo[1] < w and flags[lo] != _INSIDE
    has_hi = 0 <= hi[0] < h and 0 <= hi[1] < w and flags[hi] != _INSIDE
    if has_lo and has_hi:
        return (T[hi] - T[lo]) * 0.5
    if has_hi:
        return T[hi] - T[y, x]
    if has_lo:
        return T[y, x] - T[lo]
    return 0.0


def telea_inpaint(img: np.ndarray, mask: np.ndarray, radius: int = 3) -> np.ndarray:
    """Inpaint via the native C++ fast path when available, else numpy."""
    from drawingspinup_tpu import native
    if native.available():
        return native.telea_inpaint(img, mask, radius)
    return telea_inpaint_numpy(img, mask, radius)
