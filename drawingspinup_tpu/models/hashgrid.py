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
levels; the JAX autodiff gather-transpose serves as the backward (a fused
Pallas scatter variant measured SLOWER — see PERF_NOTES.md negative
results; Mosaic on this toolchain also rejects arbitrary VMEM gathers).
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
    # dense levels: gather/scatter ONE (8F)-wide "cell row" per point
    # instead of 8 F-wide corner rows. The widened table is rebuilt
    # in-graph from the canonical (T, F) param each step (cheap dense
    # rolls), so checkpoints/ports are unaffected and autodiff folds the
    # widened cotangent back automatically. Math identical; on v5e the
    # per-corner scatters were 172 ms of a 440 ms step (8 scatter ops ×
    # 6 levels, cost per-index) — see PERF_NOTES.md.
    # BOUNDARY-GRADIENT NOTE (ADVICE r1): at clamped coordinates (px == 1,
    # i.e. points outside/on the AABB faces after contract()) the wide path
    # yields a one-sided spatial slope where the per-corner path yielded 0.
    # Arguably the more correct derivative; the production-config 600-step
    # convergence A/B (scripts/convergence_ab_cellrows.py) ran WITH this
    # default and matched per-corner convergence within noise.
    dense_cell_rows: bool = True
    # Levels whose full grid fits in this many rows store DENSE even when
    # that exceeds table_size (tcnn would hash them): a dense level costs
    # ONE wide gather per point instead of 8 hashed row-gathers (gather
    # cost is per-index, PERF_NOTES.md §8) and has no collisions. At the
    # production yaml sets 1<<22, turning levels 4–5 (res 97/128 →
    # 0.9M/2.1M rows, 3.8/8.6 MB bf16) dense; levels ≥ res 160 still hash.
    # 0 (default) = the exact tcnn layout (dense only when fits table_size).
    dense_max_rows: int = 0
    # interpolation/jacobian COMPUTE dtype: float32 | bfloat16. The
    # trilinear weights are always derived in f32 (fractional coordinates
    # need the mantissa), then the per-corner feature×weight chain runs in
    # this dtype. bfloat16 halves the memory traffic of the elementwise
    # accumulation chain that dominates the step after gathers
    # (PERF_NOTES.md alternated decomposition). A/B'd before adoption.
    compute_dtype: str = "float32"
    # table storage dtype: float32 | bfloat16. bfloat16 halves HBM and
    # scatter byte traffic (tcnn stores fp16; bf16 is the TPU analog —
    # no loss scaling needed). Interpolation math runs in compute_dtype.
    table_dtype: str = "float32"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    def is_dense(self, r: int) -> bool:
        return (int(r) + 1) ** 3 <= max(self.table_size,
                                        self.dense_max_rows)

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


def init_table(cfg: HashGridConfig, key: jax.Array):
    """tcnn init: U(-1e-4, 1e-4). One (T_l, F) array PER LEVEL (tuple).

    Per-level tables are a TPU optimization: backward scatter-adds hit a
    small per-level target (dense levels are sized exactly (res+1)³ — the
    coarse ones stay cache-resident), measured several × faster than
    scattering into one concatenated table."""
    tables = []
    dt = jnp.dtype(cfg.table_dtype)
    for l, r in enumerate(cfg.level_resolutions()):
        t_l = int(r + 1) ** 3 if cfg.is_dense(r) else cfg.table_size
        key, k = jax.random.split(key)
        tables.append(jax.random.uniform(
            k, (t_l, cfg.n_features_per_level), jnp.float32,
            -1e-4, 1e-4).astype(dt))
    return tuple(tables)


@partial(jax.jit, static_argnames=("cfg", "n_active"))
def encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig,
           level_mask: Optional[jnp.ndarray] = None,
           n_active: Optional[int] = None) -> jnp.ndarray:
    """x: (P, 3) in [0, 1] → features (P, n_output_dims).

    level_mask: optional (L,) float — progressive band mask (1 = active).
    n_active: optional STATIC count of active levels — levels ≥ n_active
    skip their gathers entirely and emit zeros (the progressive band zeroes
    them anyway). The training loop recompiles once per level unlock; with
    start_level 4 / update_steps 1000 / max_steps 3000 the finest hash levels
    are never touched, cutting index traffic (the dominant TPU cost) ~40 %.
    include_xyz prepends x·2−1 (reference CompositeEncoding xyz_scale=2,
    xyz_offset=−1).

    TPU design, two rules learned the hard way on real hardware:
      * NO (P, L, 8, ·) intermediates — a trailing dim of 3 or 8 is padded
        to a 128-lane tile (42× memory blowup → OOM at ~2M points). All
        per-corner math uses pure (P,)-shaped vectors; per-level outputs are
        (F, P) so the big axis rides the lanes.
      * the level loop is a ``lax.scan`` (dense/hash index selection via
        ``where`` on uniform math) — a fully unrolled 80-gather graph takes
        the TPU compiler many minutes; the scanned body holds just 8·F
        gathers.
    """
    P = x.shape[0]
    px, py, pz = x[:, 0], x[:, 1], x[:, 2]
    F = cfg.n_features_per_level
    cdt = jnp.dtype(cfg.compute_dtype)
    res_list = cfg.level_resolutions()
    feats = []
    for l in range(cfg.n_levels):
        if n_active is not None and l >= n_active:
            feats.extend(jnp.zeros(px.shape, cdt) for _ in range(F))
            continue
        acc = _level_interp(table[l], px, py, pz, int(res_list[l]), cfg,
                            with_grad=False)
        feats.extend(acc)
    feats = jnp.stack(feats)                             # (L·F, P)
    if level_mask is not None:
        feats = feats * jnp.repeat(level_mask, F).astype(cdt)[:, None]
    out = feats.T                                        # (P, L·F)
    if cfg.include_xyz:
        out = jnp.concatenate([(x * 2.0 - 1.0).astype(cdt), out], axis=-1)
    return out


def _widen_dense(tab: jnp.ndarray, n_vert: int) -> jnp.ndarray:
    """(T, F) dense table → (T, 8F) cell rows: row i holds the features of
    the 8 cell corners i + {0,1} + n·{0,1} + n²·{0,1} (x-fastest layout).
    Built from cheap dense rolls each step; rolled-in wrap rows are never
    read (callers clip the base corner to ≤ r−1 per axis)."""
    cols = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                off = dx + n_vert * dy + n_vert * n_vert * dz
                cols.append(jnp.roll(tab, -off, axis=0) if off else tab)
    return jnp.concatenate(cols, axis=1)


def _level_interp(tab, px, py, pz, r, cfg, with_grad):
    """One level: 8 corner row-gathers from the per-level (T_l, F) table —
    or, for dense levels with cfg.dense_cell_rows, ONE (8F)-wide cell-row
    gather per point (8× fewer gather AND scatter indices; the dominant
    cost is per-index, PERF_NOTES.md).
    Returns [acc_f...] or ([acc_f...], [dax_f...], [day_f...], [daz_f...])."""
    F = cfg.n_features_per_level
    T = cfg.table_size
    cdt = jnp.dtype(cfg.compute_dtype)
    r_f = float(r)
    fx, fy, fz = px * r_f, py * r_f, pz * r_f
    x0f, y0f, z0f = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    n_vert = r + 1
    dense = cfg.is_dense(r)
    wide = dense and cfg.dense_cell_rows
    if wide:
        # clip the BASE corner to r−1 and recompute weights from it: for
        # px=1 exactly this yields w=1 on the far corner — identical to
        # per-corner clipping (for px<1 the clip is a no-op).
        x0 = jnp.clip(x0, 0, r - 1)
        y0 = jnp.clip(y0, 0, r - 1)
        z0 = jnp.clip(z0, 0, r - 1)
        wx = fx - x0.astype(jnp.float32)
        wy = fy - y0.astype(jnp.float32)
        wz = fz - z0.astype(jnp.float32)
        idx0 = x0 + n_vert * (y0 + n_vert * z0)
        rows = _widen_dense(tab, n_vert)[idx0].astype(cdt)  # (P, 8F)
    else:
        wx, wy, wz = fx - x0f, fy - y0f, fz - z0f
    acc = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    dax = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    day = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    daz = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    corner = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                if wide:
                    pair = rows[:, corner * F:(corner + 1) * F]
                else:
                    cx = jnp.clip(x0 + dx, 0, r).astype(jnp.uint32)
                    cy = jnp.clip(y0 + dy, 0, r).astype(jnp.uint32)
                    cz = jnp.clip(z0 + dz, 0, r).astype(jnp.uint32)
                    if dense:
                        idx = cx + np.uint32(n_vert) * (
                            cy + np.uint32(n_vert) * cz)
                    else:
                        idx = (cx * np.uint32(_PRIMES[0])) \
                            ^ (cy * np.uint32(_PRIMES[1])) \
                            ^ (cz * np.uint32(_PRIMES[2]))
                        idx = idx & np.uint32(T - 1)
                    # row gather; weight math stays f32, the feature
                    # accumulation runs in cfg.compute_dtype — for a bf16
                    # table the cast's VJP re-quantizes the cotangent so
                    # the backward scatter-add moves half the bytes
                    pair = tab[idx.astype(jnp.int32)].astype(cdt)
                # trilinear weights in f32 (fractional precision), cast at
                # the multiply boundary
                ux = wx if dx else 1.0 - wx
                uy = wy if dy else 1.0 - wy
                uz = wz if dz else 1.0 - wz
                w = (ux * uy * uz).astype(cdt)
                if with_grad:
                    sx = r_f if dx else -r_f
                    sy = r_f if dy else -r_f
                    sz = r_f if dz else -r_f
                    gx = (sx * uy * uz).astype(cdt)
                    gy = (ux * sy * uz).astype(cdt)
                    gz = (ux * uy * sz).astype(cdt)
                for f in range(F):
                    g = pair[:, f]
                    acc[f] = acc[f] + g * w
                    if with_grad:
                        dax[f] = dax[f] + g * gx
                        day[f] = day[f] + g * gy
                        daz[f] = daz[f] + g * gz
                corner += 1
    if with_grad:
        return acc, dax, day, daz
    return acc


@partial(jax.jit, static_argnames=("cfg", "n_active"))
def encode_with_spatial_grad(table, x: jnp.ndarray,
                             cfg: HashGridConfig,
                             level_mask: Optional[jnp.ndarray] = None,
                             n_active: Optional[int] = None):
    """Encoding AND its exact spatial jacobian from ONE set of gathers.

    Returns (enc (P, D), denc (3, P, D)) with D = n_output_dims. The
    trilinear weights are the only x-dependence, so
    ∂enc/∂x_k = Σ_corners feat_c · ∂w_c/∂x_k — computed in closed form from
    the same 8 gathered features. This is the TPU fast path for NeuS normal
    gradients: finite differences would re-gather at 6 probe points (7× the
    index traffic — the dominant cost), and nested autodiff (grad-of-grad)
    crashes the TPU compiler; the manual jacobian keeps the whole training
    graph first-order.
    """
    P = x.shape[0]
    px, py, pz = x[:, 0], x[:, 1], x[:, 2]
    F = cfg.n_features_per_level
    cdt = jnp.dtype(cfg.compute_dtype)
    res_list = cfg.level_resolutions()
    a_list, dx_list, dy_list, dz_list = [], [], [], []
    for l in range(cfg.n_levels):
        if n_active is not None and l >= n_active:
            for lst in (a_list, dx_list, dy_list, dz_list):
                lst.extend(jnp.zeros(px.shape, cdt) for _ in range(F))
            continue
        acc, dax, day, daz = _level_interp(table[l], px, py, pz,
                                           int(res_list[l]), cfg,
                                           with_grad=True)
        a_list.extend(acc)
        dx_list.extend(dax)
        dy_list.extend(day)
        dz_list.extend(daz)

    def finish(lst):
        arr = jnp.stack(lst)                             # (L·F, P)
        if level_mask is not None:
            arr = arr * jnp.repeat(level_mask, F).astype(cdt)[:, None]
        return arr.T                                     # (P, L·F)

    enc = finish(a_list)
    dencs = [finish(dx_list), finish(dy_list), finish(dz_list)]
    if cfg.include_xyz:
        enc = jnp.concatenate([(x * 2.0 - 1.0).astype(cdt), enc], axis=-1)
        eye = 2.0 * jnp.eye(3, dtype=enc.dtype)
        dencs = [jnp.concatenate(
            [jnp.broadcast_to(eye[k], (P, 3)), dencs[k]], axis=-1)
            for k in range(3)]
    return enc, jnp.stack(dencs)                         # (3, P, D)


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
