"""Decompose the recon EXPORT tail (~187 s in e2e round-2b — co-dominant
with training now that training is 165-180 s). Reuses a finished e2e uid's
checkpoint and mv/ tree; times every phase separately:
  device: coarse grid, fine sparse grid
  host:   carve+marching-tets, quadric remesh, thinning, laplacian smooth,
          color back-projection, shear, obj write

Usage: python scripts/profile_export.py [--root /tmp/e2e_r2b_root] [--uid e2e_timed]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import numpy as np

from drawingspinup_tpu.core import UidPaths, checkpoint as ckpt
from drawingspinup_tpu.core.io import read_image, write_obj
from drawingspinup_tpu.pipelines import stage2_recon as s2r
from drawingspinup_tpu.render import mesh_post
from drawingspinup_tpu.train import nsr


class T:
    def __init__(self):
        self.rows = []

    def __call__(self, name):
        return _Span(self, name)


class _Span:
    def __init__(self, t, name):
        self.t, self.name = t, name

    def __enter__(self):
        self.t0 = time.time()

    def __exit__(self, *a):
        dt = time.time() - self.t0
        self.t.rows.append((self.name, dt))
        print(f"  {self.name:34s} {dt:8.2f} s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/e2e_r2b_root")
    ap.add_argument("--uid", default="e2e_timed")
    ap.add_argument("--mc", type=int, default=512)
    args = ap.parse_args()

    cfg = nsr.NSRConfig()
    paths = UidPaths(args.root, args.uid)
    ckpt_root = os.path.join(paths.mesh_dir, "ckpt")
    latest = ckpt.latest_step(ckpt_root)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    state = ckpt.restore(ckpt.step_path(ckpt_root, latest), state)
    print(f"restored step {latest}", flush=True)
    front_mask = s2r.load_front_mask(paths)
    front_color = read_image(paths.mv("color", "front"))[..., :3]
    back_color = read_image(paths.mv("color", "back"))[..., :3]
    drawing_mask = read_image(paths.mask)[..., 0]

    t = T()
    # warm the device programs once (they're in the persistent cache after
    # a real run; first call in THIS process still pays program load)
    with t("device grid (cold programs)"):
        level, vmin, vmax = s2r.isosurface_level(cfg, state.params,
                                                 resolution=args.mc,
                                                 step=3000)
    with t("device grid (warm)"):
        level, vmin, vmax = s2r.isosurface_level(cfg, state.params,
                                                 resolution=args.mc,
                                                 step=3000)

    binary = (level <= 0)
    with t("front-mask carve"):
        fm = front_mask
        size = fm.shape[0] / 2
        x0 = int(np.floor(vmin[0] * size + size))
        x1 = int(np.ceil(vmax[0] * size + size))
        z0 = int(np.floor(vmin[2] * size + size))
        z1 = int(np.ceil(vmax[2] * size + size))
        crop = fm[max(x0, 0):x1, max(z0, 0):z1]
        from PIL import Image
        crop = np.asarray(Image.fromarray(
            (np.clip(crop, 0, 1) * 255).astype(np.uint8)).resize(
            (args.mc, args.mc), Image.BICUBIC), np.float32)
        binary = binary & (np.tile(crop[:, None, :], (1, args.mc, 1)) > 127)

    with t("marching tets (+sigma smooth)"):
        verts, faces = s2r.extract_isosurface(binary.astype(np.float32),
                                              sigma=1.0)
    print(f"    raw mesh: {len(verts)} verts {len(faces)} faces", flush=True)
    with t("quadric remesh -> 50k"):
        verts, faces = mesh_post.remesh(verts, faces, 50000)
    verts = verts / (args.mc - 1)
    verts = vmin[None, :] + verts * (vmax - vmin)[None, :]

    v = mesh_post.axis_swap_y_up(verts * 0.5)
    with t("laplacian smooth"):
        v2 = mesh_post.laplacian_smooth(v, faces)
    with t("color back-projection"):
        vc = mesh_post.color_projection(v2, faces, front_color, back_color,
                                        drawing_mask)
    with t("shear + write obj"):
        v3 = mesh_post.shear_transformation(v2) * 1.35
        write_obj("/tmp/profile_export.obj", v3, faces, vertex_colors=vc)

    total = sum(dt for _, dt in t.rows)
    print(f"  {'TOTAL':34s} {total:8.2f} s", flush=True)


if __name__ == "__main__":
    main()
