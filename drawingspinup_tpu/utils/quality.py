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
