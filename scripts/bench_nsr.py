"""Benchmark the NSR train step on the real TPU (default env = axon).

Usage: python scripts/bench_nsr.py [--steps 20] [--size 1024]

Synthetic 6-view sphere dataset at full image size; full default NSRConfig
(2048 rays x 128 samples + 2048 random points). Sync discipline per
PERF_NOTES.md: the axon tunnel does not honor block_until_ready, so we
chain N steps and force one D2H read of the final loss.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp

from drawingspinup_tpu.train import nsr
from drawingspinup_tpu.render.cameras import (
    ortho_ray_grid, rays_to_world, view_matrices,
)
from drawingspinup_tpu.core import VIEWS


def make_sphere_dataset(n_views=6, size=1024, radius=0.5, hull=False,
                        scene_radius=1.0):
    views = list(VIEWS[:n_views])
    c2ws, _ = view_matrices(views)
    origins, dirs = ortho_ray_grid(size, size)
    images, normals, masks = [], [], []
    for c2w in c2ws:
        ro, rd = rays_to_world(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                               c2w)
        b = np.sum(ro * rd, -1)
        c = np.sum(ro * ro, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        p = ro + t[:, None] * rd
        n = p / radius
        col = np.clip(0.5 + 0.5 * n, 0, 1)
        images.append(np.where(hit[:, None], col, 0.0).reshape(size, size, 3))
        normals.append(np.where(hit[:, None], n, 0.0).reshape(size, size, 3))
        masks.append(hit.reshape(size, size).astype(np.float32))
    data = {
        "images": jnp.asarray(np.stack(images), jnp.float32),
        "normals": jnp.asarray(np.stack(normals), jnp.float32),
        "masks": jnp.asarray(np.stack(masks), jnp.float32),
        "view_weights": jnp.ones((n_views,), jnp.float32),
        "c2w": jnp.asarray(c2ws, jnp.float32),
    }
    if hull:
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data["t_range"] = hull_t_ranges(data["masks"], data["c2w"],
                                        scene_radius)
    return data


# character-proxy: union of small spheres arranged like a stick figure —
# THIN geometry, the production regime for visual-hull sampling (drawn
# characters have thin limbs; the solid sphere is the hull's worst case)
FIGURE_SPHERES = [  # (cx, cy, cz, r)
    (0.0, 0.0, 0.55, 0.16),     # head
    (0.0, 0.0, 0.25, 0.14),     # chest
    (0.0, 0.0, 0.0, 0.12),      # belly
    (-0.22, 0.0, 0.32, 0.07), (-0.38, 0.0, 0.18, 0.06),   # left arm
    (0.22, 0.0, 0.32, 0.07), (0.38, 0.0, 0.18, 0.06),     # right arm
    (-0.1, 0.0, -0.25, 0.08), (-0.14, 0.0, -0.5, 0.07),   # left leg
    (0.1, 0.0, -0.25, 0.08), (0.14, 0.0, -0.5, 0.07),     # right leg
]


# Asymmetric ARTICULATED figure (VERDICT r2 next #7): limbs displaced in y
# (the camera-depth axis of the front view) so side views self-occlude, with
# bent joints creating concavities and inter-limb gaps the symmetric stick
# figure cannot produce — the reference's real regime (concave characters
# with self-occlusion, instant_nsr/datasets/ortho.py:100-158).
ARTICULATED_SPHERES = [  # (cx, cy, cz, r)
    (0.02, 0.06, 0.55, 0.15),                              # head, tilted
    (0.0, 0.0, 0.27, 0.14),                                # chest
    (0.02, -0.03, 0.02, 0.12),                             # belly
    (-0.20, 0.10, 0.36, 0.065), (-0.30, 0.24, 0.44, 0.055),  # L arm raised fwd
    (0.21, -0.06, 0.30, 0.065), (0.26, -0.12, 0.12, 0.055),  # R arm down/back
    (-0.09, 0.10, -0.22, 0.075), (-0.12, 0.22, -0.44, 0.065),  # L leg forward
    (0.10, -0.08, -0.25, 0.075), (0.12, -0.16, -0.50, 0.065),  # R leg back
]


def spheres_sdf(points, spheres):
    """Exact union-of-spheres SDF (outside; inside is a lower bound —
    sufficient for surface distance)."""
    pts = np.asarray(points, np.float32)
    d = np.full(len(pts), np.inf, np.float32)
    for cx, cy, cz, r in spheres:
        d = np.minimum(d, np.linalg.norm(
            pts - np.asarray([cx, cy, cz], np.float32), axis=-1) - r)
    return d


def sample_spheres_surface(spheres, n=20000, seed=0):
    """~n points on the union surface (per-sphere area-weighted direction
    samples, points inside another sphere rejected)."""
    rng = np.random.default_rng(seed)
    spheres = np.asarray(spheres, np.float32)
    areas = spheres[:, 3] ** 2
    counts = np.maximum((n * areas / areas.sum()).astype(int), 1)
    pts = []
    for (cx, cy, cz, r), m in zip(spheres, counts):
        d = rng.normal(size=(int(m * 1.5), 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        p = np.asarray([cx, cy, cz], np.float32) + r * d.astype(np.float32)
        keep = spheres_sdf(p, spheres) > -1e-4
        pts.append(p[keep])
    return np.concatenate(pts)


def make_figure_dataset(n_views=6, size=1024, hull=False, scene_radius=1.0,
                        spheres=None):
    """Analytic ortho renders of a union-of-spheres figure
    (default: the symmetric stick figure; pass ARTICULATED_SPHERES for the
    asymmetric self-occluding one)."""
    views = list(VIEWS[:n_views])
    c2ws, _ = view_matrices(views)
    origins, dirs = ortho_ray_grid(size, size)
    spheres = np.asarray(FIGURE_SPHERES if spheres is None else spheres,
                         np.float32)
    images, normals, masks = [], [], []
    for c2w in c2ws:
        ro, rd = rays_to_world(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                               c2w)
        t_best = np.full(ro.shape[0], np.inf, np.float32)
        n_best = np.zeros_like(ro)
        for cx, cy, cz, r in spheres:
            oc = ro - np.asarray([cx, cy, cz], np.float32)
            b = np.sum(oc * rd, -1)
            c = np.sum(oc * oc, -1) - r ** 2
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            closer = hit & (t < t_best)
            t_best = np.where(closer, t, t_best)
            p = oc + t[:, None] * rd
            n_best = np.where(closer[:, None], p / r, n_best)
        hit = np.isfinite(t_best)
        col = np.clip(0.5 + 0.5 * n_best, 0, 1)
        images.append(np.where(hit[:, None], col, 0.0).reshape(size, size, 3))
        normals.append(np.where(hit[:, None], n_best, 0.0)
                       .reshape(size, size, 3))
        masks.append(hit.reshape(size, size).astype(np.float32))
    data = {
        "images": jnp.asarray(np.stack(images), jnp.float32),
        "normals": jnp.asarray(np.stack(normals), jnp.float32),
        "masks": jnp.asarray(np.stack(masks), jnp.float32),
        "view_weights": jnp.ones((n_views,), jnp.float32),
        "c2w": jnp.asarray(c2ws, jnp.float32),
    }
    if hull:
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data["t_range"] = hull_t_ranges(data["masks"], data["c2w"],
                                        scene_radius)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--n-active", type=int, default=None,
                    help="static unlocked-level count (progressive band "
                         "phase); default = all levels gathered")
    ap.add_argument("--table-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cfg = nsr.NSRConfig()
    if args.table_dtype != "float32":
        import dataclasses
        grid = dataclasses.replace(cfg.sdf.grid, table_dtype=args.table_dtype)
        cfg = dataclasses.replace(
            cfg, sdf=dataclasses.replace(cfg.sdf, grid=grid))
    data = make_sphere_dataset(size=args.size)
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    for _ in range(args.warmup):
        key, k = jax.random.split(key)
        state, logs = nsr.train_step(cfg, tx, state, data, k,
                                     n_active=args.n_active)
    loss = float(logs["loss"])  # D2H sync
    print(f"warmup ({args.warmup} steps incl. compile): "
          f"{time.time() - t0:.1f}s loss={loss:.4f}")

    t0 = time.time()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, logs = nsr.train_step(cfg, tx, state, data, k,
                                     n_active=args.n_active)
    loss = float(logs["loss"])  # D2H sync
    dt = time.time() - t0
    sps = args.steps / dt
    print(f"{args.steps} steps in {dt:.2f}s -> {sps:.3f} steps/s "
          f"({1000 * dt / args.steps:.0f} ms/step), loss={loss:.4f}")
    print(f"3000-step recon ≈ {3000 / sps / 60:.1f} min")


if __name__ == "__main__":
    main()
