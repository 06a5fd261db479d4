"""Image fidelity metrics for per-stage output comparison.

The rebuild's fidelity budget is stated as LPIPS ≤ 0.02 per stage
(BASELINE.md). True LPIPS needs pretrained AlexNet/VGG weights that cannot
ship in this environment; this module provides PSNR, SSIM and a
deterministic random-feature perceptual distance (fixed-seed VGG19 prefix —
the same extractor the style GAN trains against) so stage outputs can be
regression-compared reproducibly. When real VGG weights are supplied
(``load_vgg_weights_npz``), ``perceptual_distance`` becomes LPIPS-like.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0,
         sigma: float = 1.5) -> float:
    """Mean SSIM with a gaussian window (grayscale or per-channel mean)."""
    from scipy import ndimage

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], max_val, sigma)
                              for c in range(a.shape[-1])]))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = ndimage.gaussian_filter(a, sigma)
    mu_b = ndimage.gaussian_filter(b, sigma)
    va = ndimage.gaussian_filter(a * a, sigma) - mu_a ** 2
    vb = ndimage.gaussian_filter(b * b, sigma) - mu_b ** 2
    cov = ndimage.gaussian_filter(a * b, sigma) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) \
        / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    return float(s.mean())


@lru_cache(maxsize=1)
def _vgg():
    from drawingspinup_tpu.models.generator_j import PerceptualVGG19
    model = PerceptualVGG19()
    params = jax.jit(model.init)(jax.random.PRNGKey(12345),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, params


def perceptual_distance(a: np.ndarray, b: np.ndarray,
                        vgg_npz: Optional[str] = None) -> float:
    """Mean squared distance of (random- or real-) VGG19 prefix features.
    Inputs (H, W, 3) in [0, 1]."""
    model, params = _vgg()
    if vgg_npz:
        from drawingspinup_tpu.models.generator_j import load_vgg_weights_npz
        params = load_vgg_weights_npz(params, vgg_npz)
    xa = jnp.asarray(a, jnp.float32)[None] * 2 - 1
    xb = jnp.asarray(b, jnp.float32)[None] * 2 - 1
    fa = model.apply(params, xa)
    fb = model.apply(params, xb)
    return float(jnp.mean((fa - fb) ** 2))


def chamfer_distance(va: np.ndarray, vb: np.ndarray,
                     n_sample: int = 20000, seed: int = 0) -> float:
    """Symmetric point-set chamfer (mean of both nearest-neighbor means)
    over vertex samples. Units = mesh units (the pipeline's meshes live in
    the [-0.5, 0.5]³ export box, render/mesh_post.py)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)

    def sample(v):
        if len(v) > n_sample:
            v = v[rng.choice(len(v), n_sample, replace=False)]
        return np.asarray(v, np.float64)

    sa, sb = sample(va), sample(vb)
    d_ab = cKDTree(sb).query(sa, k=1)[0]
    d_ba = cKDTree(sa).query(sb, k=1)[0]
    return float(d_ab.mean() + d_ba.mean()) / 2.0


def compare_mesh(path_a: str, path_b: str, n_sample: int = 20000) -> dict:
    """Compare two OBJ meshes: symmetric chamfer over vertices + vertex-color
    MSE matched by nearest neighbor (vertex counts/orders need not agree)."""
    from scipy.spatial import cKDTree

    from drawingspinup_tpu.core.io import read_obj

    va, fa, ca = read_obj(path_a)
    vb, fb, cb = read_obj(path_b)
    out = {"n_verts": (int(len(va)), int(len(vb))),
           "n_faces": (int(len(fa)), int(len(fb))),
           "chamfer": chamfer_distance(va, vb, n_sample=n_sample)}
    if ca is not None and cb is not None:
        idx = cKDTree(vb).query(va, k=1)[1]
        out["color_mse"] = float(np.mean((ca - cb[idx]) ** 2))
    return out


def read_gif_frames(path: str) -> list:
    """GIF → list of (H, W, 3) float [0,1] frames (full-frame composites,
    honoring disposal)."""
    from PIL import Image

    frames = []
    with Image.open(path) as im:
        try:
            while True:
                frames.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
                im.seek(im.tell() + 1)
        except EOFError:
            pass
    return frames


def compare_gif(path_a: str, path_b: str) -> dict:
    """Frame-by-frame PSNR/SSIM over the common frame prefix."""
    fa, fb = read_gif_frames(path_a), read_gif_frames(path_b)
    n = min(len(fa), len(fb))
    per = [{"psnr": psnr(fa[i], fb[i]), "ssim": ssim(fa[i], fb[i])}
           for i in range(n)]
    agg = {}
    if per:
        agg = {k: sum(p[k] for p in per) / n for k in ("psnr", "ssim")}
    return {"n_frames": (len(fa), len(fb)), "frames": per, "aggregate": agg}


def compare_stage_outputs(dir_a: str, dir_b: str) -> dict:
    """Compare every same-named PNG in two stage-output directories."""
    import os

    from drawingspinup_tpu.core.io import read_image

    out = {}
    for name in sorted(os.listdir(dir_a)):
        if not name.endswith(".png"):
            continue
        pb = os.path.join(dir_b, name)
        if not os.path.exists(pb):
            out[name] = {"missing": True}
            continue
        a = read_image(os.path.join(dir_a, name))[..., :3]
        b = read_image(pb)[..., :3]
        if a.shape[-1] < 3:   # grayscale / LA (e.g. masks) → 3-ch for VGG
            a = np.repeat(a[..., :1], 3, axis=-1)
        if b.shape[-1] < 3:
            b = np.repeat(b[..., :1], 3, axis=-1)
        out[name] = {"psnr": psnr(a, b), "ssim": ssim(a, b),
                     "perceptual": perceptual_distance(a, b)}
    return out
