"""Device-side image ops (pure JAX, NHWC or HWC float arrays).

Replaces the reference's scattered OpenCV/torchvision calls with vectorized
XLA ops: resize (torchvision bicubic — aug.py:78-106), Sobel edge maps from
NOCS renders (run_render.py:31-57), binary morphology (mask dilation in
3_style_translator/training/data.py), distance transform (thinning_utils).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def resize(img: jnp.ndarray, shape: Tuple[int, int],
           method: str = "bicubic") -> jnp.ndarray:
    """Resize (..., H, W, C) → (..., h, w, C). method: bicubic|bilinear|nearest."""
    out_shape = img.shape[:-3] + (shape[0], shape[1], img.shape[-1])
    jm = {"bicubic": "cubic", "bilinear": "linear", "nearest": "nearest"}[method]
    return jax.image.resize(img, out_shape, method=jm)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma (PIL convert('L') weights). (...,3) → (...,1)."""
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img[..., :3] * w, axis=-1, keepdims=True)


def composite_on_color(rgba: jnp.ndarray, color: float = 1.0) -> jnp.ndarray:
    """Alpha-composite an (...,4) RGBA image onto a constant background."""
    rgb, a = rgba[..., :3], rgba[..., 3:4]
    return rgb * a + color * (1.0 - a)


@partial(jax.jit, static_argnames=("radius",))
def binary_dilate(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Binary dilation with a (2r+1)² square SE. mask: (H,W) or (H,W,1) float."""
    m = mask[None, ..., None] if mask.ndim == 2 else mask[None]
    k = 2 * radius + 1
    out = lax.reduce_window(m, -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
                            "SAME")
    return out[0, ..., 0] if mask.ndim == 2 else out[0]


@partial(jax.jit, static_argnames=("radius",))
def binary_erode(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    m = mask[None, ..., None] if mask.ndim == 2 else mask[None]
    k = 2 * radius + 1
    out = lax.reduce_window(m, jnp.inf, lax.min, (1, k, k, 1), (1, 1, 1, 1),
                            "SAME")
    return out[0, ..., 0] if mask.ndim == 2 else out[0]


_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
_SOBEL_Y = _SOBEL_X.T


@jax.jit
def sobel_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Per-channel Sobel gradient magnitude, max over channels.

    Matches the reference edge extraction from NOCS position renders
    (``3_style_translator/run_render.py:31-57``): |∇| = sqrt(gx²+gy²) per
    channel, then channel-max. img: (H,W,C) float → (H,W) float."""
    x = img.astype(jnp.float32)
    h, w, c = x.shape
    lhs = x.transpose(2, 0, 1)[:, None]  # (C,1,H,W)
    kx = _SOBEL_X[None, None]
    ky = _SOBEL_Y[None, None]
    dims = ("NCHW", "OIHW", "NCHW")
    gx = lax.conv_general_dilated(lhs, kx, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dims)
    gy = lax.conv_general_dilated(lhs, ky, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dims)
    mag = jnp.sqrt(gx * gx + gy * gy)[:, 0]  # (C,H,W)
    return jnp.max(mag, axis=0)


def edge_from_pos(pos: jnp.ndarray, mask: jnp.ndarray,
                  threshold: float = 0.3) -> jnp.ndarray:
    """NOCS position render → binary edge map (reference pos2edge,
    run_render.py:31-57): Sobel magnitude over channels, threshold, keep
    inside the character mask."""
    mag = sobel_magnitude(pos)
    edge = (mag > threshold).astype(jnp.float32)
    return edge * (mask > 0.5).astype(jnp.float32)


def distance_transform(mask: jnp.ndarray, iterations: int = 0) -> jnp.ndarray:
    """Euclidean-ish distance transform of a binary mask (distance of each
    True pixel to the nearest False pixel), via iterated chamfer updates as a
    ``lax.scan`` — static shapes, TPU-friendly. Exact for L1; good
    approximation of L2 with the 3-4 chamfer weights."""
    m = (mask > 0.5).astype(jnp.float32)
    big = float(mask.shape[0] + mask.shape[1])
    d = jnp.where(m > 0, big, 0.0)
    n_iter = iterations or (mask.shape[0] + mask.shape[1])

    w_straight, w_diag = 0.955, 1.3693  # optimal 3x3 chamfer weights

    def step(d, _):
        padded = jnp.pad(d, 1, constant_values=big)
        c = padded[1:-1, 1:-1]
        s = jnp.minimum(
            jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
            jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:])) + w_straight
        g = jnp.minimum(
            jnp.minimum(padded[:-2, :-2], padded[:-2, 2:]),
            jnp.minimum(padded[2:, :-2], padded[2:, 2:])) + w_diag
        new = jnp.minimum(c, jnp.minimum(s, g))
        return new, None

    d, _ = lax.scan(step, d, None, length=n_iter)
    return d * m
