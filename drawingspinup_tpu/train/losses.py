"""Loss functions for NSR reconstruction and the style-translator GANs.

Parity with the reference loss set (``instant_nsr/systems/criterions.py`` and
``neus_ortho.py:87-169``), redesigned for static shapes: boolean masks become
weights, and the ranking loss keeps the lowest-error fraction via sort +
rank-threshold instead of dynamic fancy-indexing.

NOTE on ranking_loss: the reference implementation (criterions.py:16-27)
sorts the errors and then ``index_select``s the *sorted* array with the sort
indices — selecting a scrambled subset rather than the k smallest. We
implement the intended semantics (keep the lowest ``penalize_ratio``
fraction), which is what the paper describes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def binary_cross_entropy(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise stable BCE on probabilities (reference criterions.py:4-12
    clamps upstream; we clamp here)."""
    x = jnp.clip(x, 1e-3, 1.0 - 1e-3)
    return -(target * jnp.log(x) + (1.0 - target) * jnp.log(1.0 - x))


def ranking_loss(error: jnp.ndarray, penalize_ratio: float = 0.7,
                 mask: Optional[jnp.ndarray] = None,
                 extra_weights: Optional[jnp.ndarray] = None,
                 reduction: str = "mean") -> jnp.ndarray:
    """Keep the lowest ``penalize_ratio`` fraction of (masked) errors.

    error: (N,). mask: (N,) bool/float — invalid entries are excluded from
    both the ranking and the statistics. Static shapes: invalid entries are
    sorted to +inf and cut by a rank threshold computed from the valid count.
    """
    if mask is not None:
        m = mask.astype(jnp.float32)
        err = jnp.where(m > 0, error, jnp.inf)
        n_valid = jnp.sum(m)
    else:
        err = error
        n_valid = jnp.asarray(error.shape[0], jnp.float32)
    order = jnp.argsort(err)
    sorted_err = err[order]
    k = jnp.floor(penalize_ratio * n_valid)
    keep = (jnp.arange(err.shape[0], dtype=jnp.float32) < k).astype(jnp.float32)
    sorted_err = jnp.where(keep > 0, sorted_err, 0.0)
    if extra_weights is not None:
        sorted_err = sorted_err * extra_weights[order]
    if reduction == "mean":
        return jnp.sum(sorted_err) / jnp.maximum(k, 1.0)
    return jnp.sum(sorted_err)


def eikonal_loss(sdf_grad: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(‖∇sdf‖ − 1)² mean (reference neus_ortho.py:122-124)."""
    e = (jnp.linalg.norm(sdf_grad, axis=-1) - 1.0) ** 2
    if mask is None:
        return jnp.mean(e)
    m = mask.astype(jnp.float32)
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


def sparsity_loss(sdf: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    """exp(−scale·|sdf|) mean (reference neus_ortho.py:134-136)."""
    return jnp.mean(jnp.exp(-scale * jnp.abs(sdf)))


def normal_smooth_loss(grad: jnp.ndarray,
                       grad_perturb: jnp.ndarray) -> jnp.ndarray:
    """|∇sdf(x) − ∇sdf(x+δ)| mean (reference neus_ortho.py:138-151)."""
    return jnp.mean(jnp.abs(grad - grad_perturb))


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray,
                      eps: float = 1e-6) -> jnp.ndarray:
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    return jnp.sum(a * b, axis=-1) / jnp.maximum(na * nb, eps)
