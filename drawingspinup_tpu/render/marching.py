"""Isosurface extraction — vectorized marching tetrahedra + binary-field
smoothing.

Replaces the reference's PyMCubes C++ dependency
(``instant_nsr/models/geometry.py:33-69``: ``mcubes.smooth`` on a binary
occupancy field followed by ``mcubes.marching_cubes``). Design:

  * ``smooth_binary`` — Gaussian level-set smoothing of a binary field
    (approximates mcubes.smooth's constrained diffusion; iso level 0.5).
  * ``marching_tetrahedra`` — each cube splits into 6 tets; a tet with a sign
    change yields 1 or 2 triangles with vertices linearly interpolated on
    its edges. Fully vectorized numpy (no per-cell Python loop): all active
    cells are processed as flat arrays, and shared edge vertices are merged
    by unique edge keys. Triangle count is ~2× marching cubes, which the
    downstream quadric decimation (native/decimate.cc) reduces to the target
    face budget anyway (reference remesh → 50k faces).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage

from drawingspinup_tpu import native

# 6-tetrahedra decomposition of the unit cube (indices into the 8 cube
# corners, corner order: (x,y,z) bits with x fastest → c = x + 2y + 4z).
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 7],
    [0, 5, 7, 4],
    [0, 7, 3, 2],
    [0, 7, 2, 6],
    [0, 7, 6, 4],
], np.int32)

_CORNERS = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                     for x in (0, 1)], np.int32)
_CORNERS = _CORNERS[[0, 1, 2, 3, 4, 5, 6, 7]]  # c = x + 2y + 4z ordering


def smooth_binary(binary: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Binary occupancy → smooth level-set-ish field in [0,1]; extract at
    0.5. Gaussian approximation of mcubes.smooth. scipy's correlate1d is the
    production path; the native twin (native/march.cc::dsu_gaussian3d, same
    reflect/truncate semantics, measured warm-equal at 512³ — 5.4 s vs
    scipy 4.5 s — but it pays an extra 536 MB copy) covers scipy-free
    deployments only."""
    return ndimage.gaussian_filter(binary.astype(np.float32), sigma=sigma)


def marching_tetrahedra(field: np.ndarray, level: float = 0.5,
                        use_native: bool = True
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """field: (N, N, N) scalar; returns (verts (V,3) in index coords,
    faces (F,3) int). Surface where field crosses ``level``; vertices are
    ordered so faces wind consistently w.r.t. the gradient.

    Dispatches to the native single-scan extractor
    (native/march.cc::dsu_march_tets_run — same decomposition/case tables,
    ~15× faster than the numpy fancy-indexing path at 512³) when built;
    the numpy path below stays as the correctness oracle and fallback.
    Vertex/face ORDER differs between the two (hash-map discovery order vs
    sorted unique edge keys); geometry and winding are identical, which
    tests/test_native_march.py asserts canonically.

    A uint8 field is marched natively WITHOUT f32 conversion (level is
    rescaled ×255; edge interpolation is affine-invariant, so vertices
    are identical to marching field/255 at the original level — the
    device-smooth export ships quantized-u8 fields, and converting
    512³ on the 1-core host cost ~3 s)."""
    if (isinstance(field, np.ndarray) and field.dtype == np.uint8
            and use_native and native.available()):
        return native.march_tets(field, float(level) * 255.0)
    f = np.asarray(field, np.float32)
    if field is not f and getattr(field, "dtype", None) == np.uint8:
        f /= 255.0
    n = f.shape[0]
    assert f.shape == (n, n, n)
    if use_native and native.available():
        return native.march_tets(f, float(level))

    # active cells: any sign change among the 8 corners
    inside = f > level
    c = inside[:-1, :-1, :-1]
    any_in = np.zeros_like(c)
    all_in = np.ones_like(c)
    for dx, dy, dz in _CORNERS:
        corner = inside[dx:n - 1 + dx, dy:n - 1 + dy, dz:n - 1 + dz]
        any_in |= corner
        all_in &= corner
    active = np.argwhere(any_in & ~all_in)               # (C, 3)
    if len(active) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # corner values and global corner ids for active cells
    base = active                                        # (C, 3) int
    corner_coords = base[:, None, :] + _CORNERS[None]    # (C, 8, 3)
    vals = f[corner_coords[..., 0], corner_coords[..., 1],
             corner_coords[..., 2]]                      # (C, 8)
    # global vertex-grid ids for edge keying
    gid = (corner_coords[..., 0] * n + corner_coords[..., 1]) * n \
        + corner_coords[..., 2]                          # (C, 8)

    # Parity-mirrored decomposition: adjacent cubes must agree on the shared
    # face diagonal or the mesh cracks. Mirroring the tet corner codes with
    # XOR of the cell's per-axis parity makes the tiling face-consistent.
    xor_mask = ((base[:, 0] % 2) | ((base[:, 1] % 2) << 1)
                | ((base[:, 2] % 2) << 2)).astype(np.int32)  # (C,)
    tets = _TETS[None, :, :] ^ xor_mask[:, None, None]   # (C, 6, 4)
    tet_vals = np.take_along_axis(
        vals[:, None, :].repeat(6, 1), tets, axis=2)     # (C, 6, 4)
    tet_gids = np.take_along_axis(
        gid[:, None, :].repeat(6, 1), tets, axis=2)      # (C, 6, 4)
    tv = tet_vals.reshape(-1, 4)                         # (T, 4)
    tg = tet_gids.reshape(-1, 4)
    s = tv > level                                       # (T, 4) bool
    code = (s[:, 0].astype(np.int32) | (s[:, 1] << 1)
            | (s[:, 2] << 2) | (s[:, 3] << 3))           # 0..15

    # for each of the 14 non-trivial cases, triangles as pairs of tet-corner
    # indices (edges); cases with 1 vertex inside → 1 tri, 2 inside → 2 tris.
    # edge (a, b) = interpolated vertex between corners a and b.
    def tris_for_case(code_val):
        ins = [i for i in range(4) if (code_val >> i) & 1]
        outs = [i for i in range(4) if not (code_val >> i) & 1]
        if len(ins) == 0 or len(ins) == 4:
            return []
        if len(ins) == 1:
            a = ins[0]
            e = [(a, o) for o in outs]                   # 3 edges
            return [[e[0], e[1], e[2]]]
        if len(ins) == 3:
            a = outs[0]
            e = [(i, a) for i in ins]
            return [[e[0], e[2], e[1]]]
        # 2 in / 2 out → quad → 2 tris
        a, b = ins
        c0, d = outs
        return [[(a, c0), (b, c0), (b, d)], [(a, c0), (b, d), (a, d)]]

    # vectorized per case
    all_edges = []
    all_tris = []
    offset = 0
    for cv in range(1, 15):
        sel = np.nonzero(code == cv)[0]
        if len(sel) == 0:
            continue
        tris = tris_for_case(cv)
        for tri in tris:
            # tri: 3 edges, each (a_corner, b_corner)
            ga = tg[sel][:, [e[0] for e in tri]]         # (K, 3)
            gb = tg[sel][:, [e[1] for e in tri]]
            va = tv[sel][:, [e[0] for e in tri]]
            vb = tv[sel][:, [e[1] for e in tri]]
            all_edges.append((ga.reshape(-1), gb.reshape(-1),
                              va.reshape(-1), vb.reshape(-1)))
            all_tris.append(len(ga))

    ga = np.concatenate([e[0] for e in all_edges])
    gb = np.concatenate([e[1] for e in all_edges])
    va = np.concatenate([e[2] for e in all_edges])
    vb = np.concatenate([e[3] for e in all_edges])

    # canonical edge key (sorted pair) for dedup
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    key = lo.astype(np.int64) * (n ** 3) + hi
    uniq, inv = np.unique(key, return_inverse=True)

    # interpolated positions per unique edge (use first occurrence)
    first = np.full(len(uniq), -1, np.int64)
    order = np.arange(len(key))
    # reverse so first occurrence wins
    first[inv[::-1]] = order[::-1]
    ga_u, gb_u = ga[first], gb[first]
    va_u, vb_u = va[first], vb[first]
    t = (level - va_u) / np.where(np.abs(vb_u - va_u) < 1e-12, 1e-12,
                                  vb_u - va_u)
    t = np.clip(t, 0.0, 1.0)

    def gid_to_xyz(g):
        z = g % n
        y = (g // n) % n
        x = g // (n * n)
        return np.stack([x, y, z], -1).astype(np.float32)

    pa = gid_to_xyz(ga_u)
    pb = gid_to_xyz(gb_u)
    verts = pa + t[:, None] * (pb - pa)

    faces = inv.reshape(-1, 3).astype(np.int64)
    # drop degenerate faces (repeated vertices)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    # orient faces consistently: flip if normal disagrees with field
    # gradient — central differences sampled at face centers only (a full
    # np.gradient materializes 3×N³ floats, ~17 s of the 24 s at 512³)
    centers = verts[faces].mean(axis=1)
    ci = np.clip(np.round(centers).astype(np.int64), 0, n - 1)
    x, y, z = ci[:, 0], ci[:, 1], ci[:, 2]
    g_at = np.stack([
        f[np.minimum(x + 1, n - 1), y, z] - f[np.maximum(x - 1, 0), y, z],
        f[x, np.minimum(y + 1, n - 1), z] - f[x, np.maximum(y - 1, 0), z],
        f[x, y, np.minimum(z + 1, n - 1)] - f[x, y, np.maximum(z - 1, 0)],
    ], axis=-1)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    fn = np.cross(e1, e2)
    flip = np.sum(fn * g_at, axis=-1) > 0  # normal should point DOWN gradient
    faces[flip] = faces[flip][:, [0, 2, 1]]

    return verts, faces


def extract_isosurface(binary: np.ndarray, sigma: float = 1.0,
                       level: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Binary occupancy grid → smoothed marching-tets mesh. Vertex coords in
    [0, N−1] index space (caller rescales, matching the reference's
    verts/(res−1) then bbox scaling)."""
    return marching_tetrahedra(smooth_binary(binary, sigma), level)
