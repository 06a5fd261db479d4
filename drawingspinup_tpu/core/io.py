"""Image / mesh / GIF IO.

Thin, numpy-first wrappers: images move as float32 [0,1] HWC arrays at the
Python boundary and are converted to device arrays only inside jitted code.
OBJ read/write supports vertex colors (``v x y z r g b``) exactly like the
reference's trimesh exports (``instant_nsr/utils/mesh_utils.py:66-72``).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------

def read_image_u8(path: str) -> np.ndarray:
    """Read PNG/JPG → uint8 (H, W, C) array (no [0,1] conversion — for
    device-side feature assembly, where shipping u8 through the tunnel is
    4× cheaper than f32).

    The u8 fast path assumes 8-bit sources (every PNG this pipeline writes
    is 8-bit). A 16-bit input is rounded to u8 with a warning: the on-device
    edge test (u8 < 255) then differs from the f32 path (value/65535 < 1.0)
    for values in [65408, 65534], and pos maps lose 8 bits (ADVICE r3) —
    route external 16-bit sources through ``read_image`` instead."""
    arr = np.asarray(Image.open(path))
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype != np.uint8:
        import warnings
        warnings.warn(
            f"read_image_u8: {path} is {arr.dtype}, rounding to uint8 — "
            "the u8 fast path is exact only for 8-bit sources",
            stacklevel=2)
        arr = (np.asarray(arr, np.float32)
               / (65535.0 if arr.dtype == np.uint16 else 1.0)
               * 255.0 + 0.5).astype(np.uint8)
    return arr


def read_image(path: str, dtype=np.float32) -> np.ndarray:
    """Read PNG/JPG → float [0,1] (H,W,C) array; preserves alpha if present."""
    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype == np.uint8:
        return (arr.astype(dtype) / 255.0)
    if arr.dtype == np.uint16:
        return (arr.astype(dtype) / 65535.0)
    return arr.astype(dtype)


def write_image(path: str, arr: np.ndarray) -> None:
    """Write float [0,1] (H,W,C) or (H,W) array as 8-bit PNG."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    a = np.asarray(arr)
    if a.dtype in (np.float32, np.float64, np.float16):
        a = np.clip(np.asarray(a, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    # compress_level=1: PNG is lossless at every level (identical pixels);
    # the default level-6 deflate made PNG encode the dominant host cost of
    # the stage-3 full-frame evals on this 1-core box (PERF_NOTES r3)
    Image.fromarray(a).save(path, compress_level=1)


def write_gif(path: str, frames: Sequence[np.ndarray], duration_ms: int = 30,
              loop: int = 0) -> None:
    """Looping GIF, 30 ms/frame default, disposal=2 — matches the reference
    gif writer output settings (``3_style_translator/gif_writer.py:30``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pil = []
    for f in frames:
        a = np.asarray(f)
        if a.dtype != np.uint8:
            a = np.clip(np.asarray(a, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        pil.append(Image.fromarray(a))
    pil[0].save(path, save_all=True, append_images=pil[1:], duration=duration_ms,
                loop=loop, disposal=2)


# ---------------------------------------------------------------------------
# meshes
# ---------------------------------------------------------------------------

def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
              vertex_colors: Optional[np.ndarray] = None,
              uvs: Optional[np.ndarray] = None,
              texture_png: Optional[np.ndarray] = None) -> None:
    """OBJ export. vertices (V,3) f32, faces (F,3) int (0-based), optional
    per-vertex colors (V,3) in [0,1], optional per-vertex uvs (V,2) plus a
    texture image written alongside with a minimal .mtl."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64) + 1
    lines: List[str] = []
    if uvs is not None and texture_png is not None:
        mtl_path = os.path.splitext(path)[0] + ".mtl"
        tex_path = os.path.splitext(path)[0] + ".png"
        write_image(tex_path, texture_png)
        with open(mtl_path, "w") as m:
            m.write("newmtl material_0\nKd 1 1 1\nmap_Kd "
                    + os.path.basename(tex_path) + "\n")
        lines.append(f"mtllib {os.path.basename(mtl_path)}")
        lines.append("usemtl material_0")
    if vertex_colors is not None:
        c = np.clip(np.asarray(vertex_colors, np.float32), 0, 1)
        for p, col in zip(v, c):
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{col[0]:.6f} {col[1]:.6f} {col[2]:.6f}")
    else:
        for p in v:
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    if uvs is not None:
        for t in np.asarray(uvs, np.float32):
            lines.append(f"vt {t[0]:.6f} {t[1]:.6f}")
        for tri in f:
            lines.append(f"f {tri[0]}/{tri[0]} {tri[1]}/{tri[1]} {tri[2]}/{tri[2]}")
    else:
        for tri in f:
            lines.append(f"f {tri[0]} {tri[1]} {tri[2]}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def read_obj(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Read OBJ → (vertices (V,3), faces (F,3) 0-based, vertex_colors or None).
    Triangulates polygon faces by fan. Ignores normals/uv indices."""
    verts: List[List[float]] = []
    colors: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
                if len(t) >= 7:
                    colors.append([float(x) for x in t[4:7]])
            elif t[0] == "f":
                idx = [int(x.split("/")[0]) - 1 for x in t[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64)
    c = np.asarray(colors, np.float32) if len(colors) == len(verts) and colors else None
    return v, f, c
