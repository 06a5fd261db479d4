"""Multi-resolution hash-grid encoding — pure-JAX (gather-based), tcnn-compatible.

Replaces tiny-cuda-nn's ``tcnn.Encoding(HashGrid)`` used by the reference
(``instant_nsr/models/network_utils.py:40-66``) with an instant-ngp-scheme
encoding that XLA vectorizes as batched gathers:

  * per level l: resolution N_l = floor(base · b^l); dense indexing when the
    grid fits the table, else spatial hash (x·1 ^ y·2654435761 ^ z·805459861)
    mod T (same scheme as tcnn ⇒ ported tables stay valid).
  * trilinear interpolation of the 8 corner features.
  * progressive band masking (coarse-to-fine): levels ≥ current are zeroed,
    with current = start_level + step // update_steps
    (reference ProgressiveBandHashGrid.update_step).

The table lives as one (L, T, F) array so a single 2-axis gather serves all
levels; a Pallas scatter-add backward is the planned optimization
(kernels/hashgrid.py) — the JAX autodiff gather-transpose is correct today.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 10
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 32
    per_level_scale: float = 1.3195079107728942
    include_xyz: bool = True
    # progressive band (coarse-to-fine) schedule
    start_level: int = 4
    start_step: int = 0
    update_steps: int = 1000

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level + (3 if self.include_xyz else 0)

    def level_resolutions(self) -> np.ndarray:
        ls = np.arange(self.n_levels)
        return np.floor(self.base_resolution * self.per_level_scale ** ls
                        ).astype(np.int32)

    def current_level(self, step: int) -> int:
        return min(self.start_level + max(step - self.start_step, 0)
                   // self.update_steps, self.n_levels)


def init_table(cfg: HashGridConfig, key: jax.Array) -> jnp.ndarray:
    """tcnn init: U(-1e-4, 1e-4). Shape (L, T, F) float32."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features_per_level),
        jnp.float32, -1e-4, 1e-4)


def _corner_indices(grid: jnp.ndarray, res: jnp.ndarray,
                    table_size: int) -> jnp.ndarray:
    """grid: (..., L, 8, 3) int corner coords; res: (L,) level resolutions.
    Returns flat table indices (..., L, 8), dense where the level fits."""
    n_vert = res + 1
    # float compare avoids int overflow for fine levels
    dense_ok = (n_vert.astype(jnp.float32) ** 3) <= table_size  # (L,)
    gx = grid[..., 0].astype(jnp.uint32)
    gy = grid[..., 1].astype(jnp.uint32)
    gz = grid[..., 2].astype(jnp.uint32)
    stride = n_vert.astype(jnp.uint32)
    dense = gx + stride[:, None] * (gy + stride[:, None] * gz)
    hashed = (gx * np.uint32(_PRIMES[0])) ^ (gy * np.uint32(_PRIMES[1])) \
        ^ (gz * np.uint32(_PRIMES[2]))
    hashed = hashed & np.uint32(table_size - 1)
    idx = jnp.where(dense_ok[:, None], dense, hashed)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg",))
def encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig,
           level_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (P, 3) in [0, 1] → features (P, n_output_dims).

    level_mask: optional (L,) float — progressive band mask (1 = active).
    include_xyz prepends x·2−1 (reference CompositeEncoding xyz_scale=2,
    xyz_offset=−1).
    """
    res = jnp.asarray(cfg.level_resolutions())           # (L,)
    p = x[:, None, :] * res[None, :, None]               # (P, L, 3)
    p0 = jnp.floor(p)
    frac = p - p0                                        # (P, L, 3)
    p0 = p0.astype(jnp.int32)

    # 8 corners: binary offsets
    offs = jnp.asarray([[i, j, k] for i in (0, 1) for j in (0, 1)
                        for k in (0, 1)], jnp.int32)     # (8, 3)
    corners = p0[:, :, None, :] + offs[None, None]       # (P, L, 8, 3)
    corners = jnp.clip(corners, 0, res[None, :, None, None])
    idx = _corner_indices(corners, res, cfg.table_size)  # (P, L, 8)

    # one flat gather over the whole table: (L·T, F)[l·T + idx]
    flat = table.reshape(cfg.n_levels * cfg.table_size,
                         cfg.n_features_per_level)
    gidx = idx + (jnp.arange(cfg.n_levels, dtype=jnp.int32)
                  * cfg.table_size)[None, :, None]       # (P, L, 8)
    feats = flat[gidx.reshape(-1)].reshape(
        x.shape[0], cfg.n_levels, 8, cfg.n_features_per_level)

    # trilinear weights
    w = jnp.where(offs[None, None, :, :] == 1, frac[:, :, None, :],
                  1.0 - frac[:, :, None, :])             # (P, L, 8, 3)
    w = jnp.prod(w, axis=-1, keepdims=True)              # (P, L, 8, 1)
    out = jnp.sum(feats * w, axis=2)                     # (P, L, F)

    if level_mask is not None:
        out = out * level_mask[None, :, None]
    out = out.reshape(x.shape[0], cfg.n_levels * cfg.n_features_per_level)
    if cfg.include_xyz:
        out = jnp.concatenate([x * 2.0 - 1.0, out], axis=-1)
    return out


def progressive_mask(cfg: HashGridConfig, step: jnp.ndarray) -> jnp.ndarray:
    """(L,) float mask of active levels at a (traced) step."""
    cur = jnp.minimum(cfg.start_level
                      + jnp.maximum(step - cfg.start_step, 0) // cfg.update_steps,
                      cfg.n_levels)
    return (jnp.arange(cfg.n_levels) < cur).astype(jnp.float32)


def finite_difference_eps(cfg: HashGridConfig, step: jnp.ndarray,
                          radius: float = 1.0) -> jnp.ndarray:
    """Progressive FD epsilon = one cell of the current finest active level
    (reference VolumeSDF.update_step, geometry.py:196-215)."""
    cur = jnp.minimum(cfg.start_level
                      + jnp.maximum(step - cfg.start_step, 0) // cfg.update_steps,
                      cfg.n_levels)
    grid_res = cfg.base_resolution * cfg.per_level_scale ** (cur.astype(jnp.float32) - 1.0)
    return 2.0 * radius / grid_res
