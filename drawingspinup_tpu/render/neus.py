"""NeuS volume rendering — fixed-shape, TPU-first.

Re-designs the reference renderer (``instant_nsr/models/neus.py:43-241``)
around XLA's static-shape model:

  reference (CUDA/nerfacc)                  this module (TPU)
  ----------------------------------------  --------------------------------
  occupancy-grid ray marching producing a   AABB slab test → per-ray
  ragged, compacted sample list             stratified uniform samples +
                                            inverse-CDF importance resampling
                                            (fixed R×S shapes, no compaction)
  render_weight_from_alpha /                closed-form cumprod compositing
  accumulate_along_rays segmented scans     over the samples axis
  sequential FD gradient evals              one batched field eval

The NeuS alpha math (sigmoid-CDF section estimate with cosine annealing,
reference ``get_alpha`` neus.py:90-112) is preserved exactly. Empty-space
suppression (reference nerfacc OccupancyGrid, neus.py:70-84) is done by
``render/hull.py``'s static visual-hull t-ranges instead.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def aabb_intersect(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   radius: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test against the cube [-r, r]³. Returns (t_near, t_far), with
    t_near >= 0; rays that miss get t_far <= t_near."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9,
                            jnp.sign(rays_d) * 1e-9 + 1e-10, rays_d)
    t0 = (-radius - rays_o) * inv_d
    t1 = (radius - rays_o) * inv_d
    t_min = jnp.minimum(t0, t1).max(axis=-1)
    t_max = jnp.maximum(t0, t1).min(axis=-1)
    return jnp.maximum(t_min, 0.0), t_max


def stratified_samples(key: Optional[jax.Array], t_near: jnp.ndarray,
                       t_far: jnp.ndarray, n: int,
                       randomized: bool) -> jnp.ndarray:
    """(R,) near/far → (R, n) sample distances (bin midpoints, jittered when
    randomized)."""
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    u = jnp.broadcast_to(u, t_near.shape + (n,))
    if randomized and key is not None:
        jitter = (jax.random.uniform(key, u.shape) - 0.5) / n
        u = u + jitter
    return t_near[..., None] + (t_far - t_near)[..., None] * u


def sample_pdf(key: Optional[jax.Array], t_mid: jnp.ndarray,
               weights: jnp.ndarray, n: int,
               randomized: bool) -> jnp.ndarray:
    """Inverse-CDF importance sampling of n new t values from per-bin
    weights. t_mid: (R, S), weights: (R, S) → (R, n)."""
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros_like(pdf[..., :1]), jnp.cumsum(pdf, axis=-1)], axis=-1)
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    u = jnp.broadcast_to(u, t_mid.shape[:-1] + (n,))
    if randomized and key is not None:
        u = u + (jax.random.uniform(key, u.shape) - 0.5) / n
        u = jnp.clip(u, 0.0, 1.0 - 1e-6)
    # index = #(cdf entries ≤ u): a (R, S+1, n) comparison-count instead of
    # vmapped searchsorted — bit-identical and 2.2× faster on TPU (16.4 →
    # 7.5 ms at production shapes; binary search is serial per element while
    # the count is one VPU reduction, PERF_NOTES.md round 2)
    idx = jnp.sum((cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32),
                  axis=-2)                               # (R, n) in [1, S+1]
    idx = jnp.clip(idx, 1, t_mid.shape[-1])
    below = idx - 1
    above = jnp.minimum(idx, t_mid.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, idx, axis=-1)
    t_b = jnp.take_along_axis(t_mid, below, axis=-1)
    t_a = jnp.take_along_axis(t_mid, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    frac = (u - cdf_b) / denom
    return t_b + frac * (t_a - t_b)


def neus_alpha(sdf: jnp.ndarray, normal: jnp.ndarray, dirs: jnp.ndarray,
               dists: jnp.ndarray, inv_s: jnp.ndarray,
               cos_anneal_ratio: jnp.ndarray) -> jnp.ndarray:
    """NeuS section alpha (reference neus.py:90-112). All (..., S) shapes
    except dirs (..., S, 3)."""
    true_cos = jnp.sum(dirs * normal, axis=-1)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    return jnp.clip(alpha, 0.0, 1.0)


def composite(alpha: jnp.ndarray, values: Dict[str, jnp.ndarray]
              ) -> Dict[str, jnp.ndarray]:
    """alpha (R, S) → weights via transmittance cumprod; accumulate each
    (R, S, C) entry of values plus opacity/weights."""
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans                              # (R, S)
    out = {"weights": weights,
           "opacity": jnp.sum(weights, axis=-1, keepdims=True)}
    for k, v in values.items():
        out["comp_" + k] = jnp.sum(weights[..., None] * v, axis=-2)
    return out

# NOTE: the reference's nerfacc OccupancyGrid (neus.py:70-84) has no
# runtime equivalent here by design — render/hull.py's static visual-hull
# t-ranges replace dynamic empty-space pruning (quality-gated in
# PERF_NOTES.md r2); an EMA-grid port existed through round 2 but was
# dead code and was removed.
