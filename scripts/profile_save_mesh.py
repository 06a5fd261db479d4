"""Host-only decomposition of the save_mesh export phases at production
scale (50k-face mesh, 512-px front mask, 2048-px colors) on synthetic
inputs — no checkpoint needed, so it runs on a fresh machine.

Phases timed separately: thinning (split into its sub-steps), implicit
laplacian smooth, color back-projection (split), shear, obj write.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from drawingspinup_tpu import native
from drawingspinup_tpu.ops import skeleton as sk
from drawingspinup_tpu.render import mesh_post


def make_mesh(n_faces=50000):
    """Blobby closed surface with ~n_faces triangles via a UV sphere warped
    by low-frequency noise — production-ish vertex/face counts."""
    n_lat = int(np.sqrt(n_faces / 4))
    n_lon = 2 * n_lat
    lat = np.linspace(1e-3, np.pi - 1e-3, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    r = 0.35 * (1 + 0.25 * np.sin(3 * LA) * np.cos(2 * LO))
    x = r * np.sin(LA) * np.cos(LO)
    z = r * np.sin(LA) * np.sin(LO)
    y = r * np.cos(LA) * 1.2
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_lat * n_lon).reshape(n_lat, n_lon)
    a = idx[:-1, :]
    b = idx[1:, :]
    c = np.roll(idx[1:, :], -1, axis=1)
    d = np.roll(idx[:-1, :], -1, axis=1)
    f1 = np.stack([a, b, c], -1).reshape(-1, 3)
    f2 = np.stack([a, c, d], -1).reshape(-1, 3)
    faces = np.concatenate([f1, f2]).astype(np.int32)
    return verts, faces


def main():
    verts, faces = make_mesh()
    print(f"mesh: {len(verts)} verts, {len(faces)} faces", flush=True)
    rng = np.random.default_rng(0)
    res = 512
    yy, xx = np.mgrid[0:res, 0:res]
    # figure-ish mask: a blob + a thin arm (so thinning finds strokes)
    blob = ((xx - 256) ** 2 / 120 ** 2 + (yy - 280) ** 2 / 160 ** 2) < 1
    arm = (np.abs(xx - (yy * 0.3 + 100)) < 5) & (yy > 100) & (yy < 400)
    front_mask = (blob | arm).astype(np.float32)
    front_color = rng.random((2048, 2048, 3)).astype(np.float32)
    back_color = rng.random((2048, 2048, 3)).astype(np.float32)

    t = {}

    def lap(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = time.time() - t0
        print(f"  {name:28s} {t[name]:7.2f}s", flush=True)
        return out

    v = verts * 0.5
    v = mesh_post.axis_swap_y_up(v)

    # --- thinning decomposition ---
    mask = (front_mask > 0).astype(np.uint8) * 255
    distance = lap("thin.distance_xform", lambda: sk.distance_transform_l2(mask))
    skel = lap("thin.skeletonize", lambda: sk.skeletonize(mask))
    mov = ((skel > 0) & (distance <= 6)).astype(np.uint8) * 255
    mov = lap("thin.remove_intersections",
              lambda: sk.remove_intersections(mov, skel, 11))
    mov = sk.dilate(mov, 1)
    coords = np.argwhere(mov > 0).astype(np.float32)
    print(f"  (thin-stroke pixels: {len(coords)})", flush=True)
    v2 = lap("thinning_total",
             lambda: mesh_post.thinning_processing(v, faces, front_mask))

    v3 = lap("laplacian_smooth", lambda: mesh_post.laplacian_smooth(v2, faces))

    # --- color projection decomposition ---
    cres = 2048
    pix_scale = cres - 1
    pvx = (v3[:, 0] + 0.5) * pix_scale
    pvy = (-v3[:, 1] + 0.5) * pix_scale
    rv = np.stack([pvx, pvy, v3[:, 2]], axis=1).astype(np.float32)
    lap("cbp.rasterize2048",
        lambda: native.rasterize(rv, faces, cres, cres, z_mode=1))
    fm = (front_mask > 0.5).astype(np.uint8) * 255
    fm2 = mesh_post._resize_nearest(fm, cres)
    lap("cbp.erode19", lambda: sk.erode(fm2, 19))
    # NOTE (ADVICE r2): color_projection raycasts in MESH space (mesh_post.py
    # passes `verts`, not the pixel-scaled raster verts — only rasterize uses
    # rv), so timing with v3 here decomposes the real sub-step faithfully.
    lap("cbp.raycast_vis",
        lambda: native.raycast_z(v3, faces, v3 + np.asarray([0, 0, 1e-4]), +1))
    colors = lap("color_projection_total",
                 lambda: mesh_post.color_projection(
                     v3, faces, front_color, back_color, front_mask))

    v4 = lap("shear", lambda: mesh_post.shear_transformation(v3))
    from drawingspinup_tpu.core.io import write_obj
    lap("write_obj", lambda: write_obj("/tmp/_prof_mesh.obj", v4, faces,
                                       vertex_colors=colors))

    total = t["thinning_total"] + t["laplacian_smooth"] + \
        t["color_projection_total"] + t["shear"] + t["write_obj"]
    print(f"\nsave_mesh-equivalent total: {total:.2f}s", flush=True)


if __name__ == "__main__":
    main()
