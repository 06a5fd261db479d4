"""Stage 2b — NSR reconstruction pipeline (recon.py equivalent).

Parity with the reference flow (``recon.py`` + ``instant_nsr/``):
  mv/{color,normal,mask}/<view>.png → on-device NeuS training (3000 steps)
  → coarse/fine isosurface with front-mask carving → quadric remesh (50k)
  → thinning / smoothing / color back-projection / shear → OBJ.

Dataset conventions mirror ``instant_nsr/datasets/ortho.py``: per-uid view
fallbacks (:113-127), normals world-transformed through the front view
(:79-87), masks binarized at 127, the front mask rotated 90° clockwise for
isosurface carving (:153-158).
"""
from __future__ import annotations

import sys
import os
import time
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu import native
from drawingspinup_tpu.core import Config, UidPaths
from drawingspinup_tpu.core.io import read_image, write_image
from drawingspinup_tpu.models.fields import sdf_forward
from drawingspinup_tpu.models.hashgrid import progressive_mask
from drawingspinup_tpu.render import mesh_post
from drawingspinup_tpu.render.cameras import opengl_to_opencv, view_matrices, w2c_opengl
from drawingspinup_tpu.render.marching import extract_isosurface
from drawingspinup_tpu.train import nsr

# per-uid reduced view sets (reference ortho.py:113-127)
TWO_VIEW_UIDS = {"025dc91b146d4f57bd114e07165ff7bd",
                 "b03fed9c34f64114a62c7a963fa804e5",
                 "e91d8a6d3aa444f9b10f3a14a6e0a287"}
FOUR_VIEW_UIDS = {"b32e37e2f0354f569ea9265d753891f7",
                  "b718c3fb937a416b9fe49ff984a1504e",
                  "d12bed5708ed42f2b615b7911c0291fa",
                  "d2f443e21595431f9f2cd580f291f51b"}
SIX_VIEWS = ["front", "front_right", "right", "back", "left", "front_left"]

# DSU_PROFILE_EXPORT=1 → per-substep timing prints inside the export grid
# eval (scripts/profile_grid_phase.py)
_PROF_EXPORT = os.environ.get("DSU_PROFILE_EXPORT", "0") not in ("", "0")


def _prof(tag: str, t0: float) -> float:
    if _PROF_EXPORT:
        print(f"[grid-prof] {tag}: {time.time() - t0:.2f}s", flush=True)
    return time.time()


def views_for_uid(uid: str) -> List[str]:
    if uid in TWO_VIEW_UIDS:
        return ["front", "back"]
    if uid in FOUR_VIEW_UIDS:
        return ["front", "front_right", "back", "front_left"]
    return SIX_VIEWS


def load_ortho_data(paths: UidPaths, im_size: int = 1024,
                    hull_trange: bool = True, radius: float = 1.0
                    ) -> Dict[str, jnp.ndarray]:
    """Load the per-uid multi-view set into device arrays for the trainer.

    hull_trange: attach per-ray visual-hull [t_near, t_far] intervals
    ("t_range") so training samples concentrate around the surface
    (render/hull.py; replaces the reference's dynamic occupancy pruning,
    neus.py:118-129). For 2-view uids (front/back are antiparallel) the
    hull degenerates to the full span — harmless."""
    views = views_for_uid(paths.uid)
    c2ws, _ = view_matrices(views)
    # front-view rotation for normal world transform (normal_system='front')
    front_w2c = opengl_to_opencv(w2c_opengl("front"))
    rot_front_c2w = front_w2c[:3, :3].T

    gl2cv = np.array([1.0, -1.0, -1.0], np.float32)

    images, normals, masks = [], [], []
    for view in views:
        color = read_image(paths.mv("color", view))[..., :3]
        normal_img = read_image(paths.mv("normal", view))[..., :3]
        mask = read_image(paths.mv("mask", view))[..., 0]
        if color.shape[0] != im_size:
            from PIL import Image
            def rs(a, mode):
                img = Image.fromarray(
                    (np.clip(a, 0, 1) * 255).astype(np.uint8))
                return np.asarray(img.resize((im_size, im_size), mode),
                                  np.float32) / 255.0
            color = rs(color, Image.LANCZOS)
            normal_img = rs(normal_img, Image.LANCZOS)
            mask = rs(mask[..., None].repeat(3, -1), Image.NEAREST)[..., 0]
        normal = normal_img * 2.0 - 1.0
        m = mask > (127 / 255)
        normal[~m] = 0.0
        normal_cv = normal * gl2cv[None, None, :]
        normal_world = normal_cv @ rot_front_c2w.T
        images.append(color)
        normals.append(normal_world)
        masks.append(m.astype(np.float32))

    data = {
        "images": jnp.asarray(np.stack(images), jnp.float32),
        "normals": jnp.asarray(np.stack(normals), jnp.float32),
        "masks": jnp.asarray(np.stack(masks), jnp.float32),
        "view_weights": jnp.ones((len(views),), jnp.float32),
        "c2w": jnp.asarray(c2ws, jnp.float32),
    }
    if hull_trange:
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data["t_range"] = hull_t_ranges(data["masks"], data["c2w"], radius)
    return data


def load_front_mask(paths: UidPaths) -> Optional[np.ndarray]:
    """char/mask.png rotated 90° clockwise — the [x, z]-indexed carving mask
    (reference ortho.py:153-158)."""
    if not os.path.exists(paths.mask):
        return None
    m = read_image(paths.mask)[..., 0]
    return np.rot90(m, k=-1).copy()


# ---------------------------------------------------------------------------
# isosurface extraction (reference geometry.py:83-117 + MarchingCubeHelper)
# ---------------------------------------------------------------------------

def eval_sdf_grid(cfg: nsr.NSRConfig, params, vmin: np.ndarray,
                  vmax: np.ndarray, resolution: int,
                  step: int = 10 ** 9) -> np.ndarray:
    """SDF on a res³ grid spanning [vmin, vmax], evaluated ENTIRELY on
    device (coords generated in-graph, one lax.map slab per x-plane, one
    bf16 D2H of the full grid). Returns (res, res, res) float32, meshgrid
    'ij' (x, y, z).

    The earlier host-chunked loop made res³/chunk (512 at mc512) sequential
    H2D→eval→D2H round trips through the device tunnel — ~6 min of the
    export. This form runs ≤8 device programs (lax.map over x-planes inside
    each) with a ~34 MB bf16 D2H per program at the measured ~65 MB/s
    (PERF_NOTES.md). A single 512-plane program crashed the remote worker
    (watchdog), hence the split — np.array_split so EVERY resolution gets
    bounded-size programs (not just multiples of 8)."""
    R = resolution
    level_mask = progressive_mask(cfg.sdf.grid, jnp.asarray(step))
    # statically elide never-unlocked hash levels (same trick as the train
    # step): with the reference schedule levels 7-9 are never activated,
    # and gather cost is per-index — they were ~45% of the export grid's
    # index traffic when gathered-then-masked
    n_active = min(cfg.sdf.grid.current_level(step), cfg.sdf.grid.n_levels)
    _grid = _grid_eval_fn(cfg.sdf, R, n_active)

    xs_full = np.linspace(vmin[0], vmax[0], R, dtype=np.float32)
    # pad to EQUAL slab widths (last slab repeats the final plane): uneven
    # np.array_split produced two program shapes per odd R (17- and 16-wide
    # at R=129) — one extra cold program load for zero benefit (r5)
    n_parts = min(8, R)
    width = -(-R // n_parts)
    pad = n_parts * width - R
    xs_pad = np.concatenate([xs_full, np.repeat(xs_full[-1:], pad)]) \
        if pad else xs_full
    vmin_j, vmax_j = jnp.asarray(vmin), jnp.asarray(vmax)
    # dispatch ALL slab programs before fetching any: async dispatch then
    # overlaps program k+1's compute with program k's ~34 MB D2H (the
    # blocking per-part form serialized compute→fetch→compute→fetch)
    futs = [_grid(params, level_mask, jnp.asarray(xs_part), vmin_j, vmax_j)
            for xs_part in xs_pad.reshape(n_parts, width)]
    parts = [np.asarray(f, dtype=np.float32) for f in futs]
    return np.concatenate(parts, axis=0)[:R].reshape(R, R, R)


@lru_cache(maxsize=8)
def _grid_eval_fn(sdf_cfg, R: int, n_active: int):
    """Memoized jitted slab evaluator — a sweep exports once per uid and
    re-lowering the field graph each time is pure overhead."""

    @jax.jit
    def _grid(params, level_mask, xs_part, vmin, vmax):
        lin1 = jnp.linspace(vmin[1], vmax[1], R)
        lin2 = jnp.linspace(vmin[2], vmax[2], R)
        ys, zs = jnp.meshgrid(lin1, lin2, indexing="ij")

        def slab(x):
            pts = jnp.stack([jnp.full_like(ys, x), ys, zs],
                            axis=-1).reshape(-1, 3)
            sdf, _ = sdf_forward(sdf_cfg, params["geometry"], pts,
                                 level_mask, n_active=n_active)
            return sdf.astype(jnp.bfloat16)

        return jax.lax.map(slab, xs_part)

    return _grid


@lru_cache(maxsize=8)
def _block_eval_fn(sdf_cfg, block: int, cells_per_launch: int,
                   n_active: int):
    """Jitted sparse-block evaluator: (CB,3) int block ids → (CB, b³) sdf.
    Fine coordinates are generated IN-GRAPH from the block ids, so each
    launch uploads ~CB·12 bytes instead of CB·b³·12 (the tunnel's H2D
    bandwidth is the constraint, PERF_NOTES.md). The grid spacing is a
    RUNTIME input (inv_denom = 1/(R−1)), so ONE program serves both the
    fine grid and the coarse passes — the remote service reloads each
    program once per uid (~8 s for the slab evaluator, r5 profile), so
    fewer distinct programs is wall time, not just cold start."""

    @jax.jit
    def _eval(params, level_mask, block_ids, vmin, vmax, inv_denom):
        b = block
        offs = jnp.stack(jnp.meshgrid(jnp.arange(b), jnp.arange(b),
                                      jnp.arange(b), indexing="ij"),
                         axis=-1).reshape(-1, 3)               # (b³, 3)
        idx = block_ids[:, None, :] * b + offs[None, :, :]     # (CB, b³, 3)
        t = idx.astype(jnp.float32) * inv_denom
        pts = (vmin[None, None, :]
               + t * (vmax - vmin)[None, None, :]).reshape(-1, 3)
        sdf, _ = sdf_forward(sdf_cfg, params["geometry"], pts, level_mask,
                             n_active=n_active)
        return sdf.reshape(cells_per_launch, b ** 3).astype(jnp.bfloat16)

    return _eval


def eval_sdf_grid_blocks(cfg: nsr.NSRConfig, params, vmin: np.ndarray,
                         vmax: np.ndarray, resolution: int,
                         step: int = 10 ** 9, block: int = 4) -> np.ndarray:
    """Full (res³) SDF grid THROUGH THE BLOCK EVALUATOR — the same device
    program the sparse fine pass uses (one program per uid instead of
    slab + block). Evaluates ceil(res/b)³ blocks and crops; host
    reassembly is ~10 MB at the coarse resolutions this serves."""
    b = block
    nbk = -(-resolution // b)
    ids = np.stack(np.meshgrid(np.arange(nbk), np.arange(nbk),
                               np.arange(nbk), indexing="ij"),
                   axis=-1).reshape(-1, 3).astype(np.int32)
    level_mask = progressive_mask(cfg.sdf.grid, jnp.asarray(step))
    n_active = min(cfg.sdf.grid.current_level(step), cfg.sdf.grid.n_levels)
    cb = max(1, 262144 // b ** 3)
    _eval = _block_eval_fn(cfg.sdf, b, cb, n_active)
    pad = (-len(ids)) % cb
    ids_p = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)]) \
        if pad else ids
    inv_denom = jnp.float32(1.0 / (resolution - 1))
    vmin_j, vmax_j = jnp.asarray(vmin), jnp.asarray(vmax)
    futs = [_eval(params, level_mask, jnp.asarray(part), vmin_j, vmax_j,
                  inv_denom)
            for part in ids_p.reshape(-1, cb, 3)]
    vals = np.concatenate([np.asarray(f, dtype=np.float32) for f in futs]
                          )[:len(ids)]
    grid = vals.reshape(nbk, nbk, nbk, b, b, b).transpose(
        0, 3, 1, 4, 2, 5).reshape(nbk * b, nbk * b, nbk * b)
    return np.ascontiguousarray(
        grid[:resolution, :resolution, :resolution])


def eval_sdf_grid_sparse(cfg: nsr.NSRConfig, params, vmin: np.ndarray,
                         vmax: np.ndarray, resolution: int,
                         step: int = 10 ** 9, block: int = 4,
                         band_cells: float = 2.0) -> np.ndarray:
    """Surface-band sparse version of ``eval_sdf_grid``: evaluate a coarse
    (R/block+1)³ grid over the same extent, then re-evaluate at full
    resolution ONLY the ``block``³ fine blocks whose coarse cell corners
    come within ``band_cells`` coarse cells of the surface (dilated by one
    block). Off-band blocks are filled piecewise-constant from their cell's
    low corner — only the SIGN matters there (binary marching,
    geometry.py:50-61 semantics), and under the eikonal Lipschitz bound a
    sign-wrong fill would need |sdf(corner)| < cell·√3 < band, which forces
    the block into the evaluated band first. So the sparse grid's sign
    field equals the dense one's by construction, not luck (equivalence
    tested in tests/test_stage2_pipeline.py).

    At mc512 the surface band covers ~8-12% of the 134 M grid points,
    cutting the export's dominant cost (~60 s dense grid eval,
    PERF_NOTES.md) to the coarse pass + band evals."""
    R = resolution
    assert R % block == 0, (R, block)
    assert band_cells >= 1.8, "band must cover the cell diagonal (√3)"
    nb = R // block
    rc = nb + 1
    t0 = time.time()
    coarse = eval_sdf_grid(cfg, params, vmin, vmax, rc, step=step)
    t0 = _prof("sparse: coarse eval", t0)

    cell_world = float(np.max((vmax - vmin) / (rc - 1)))
    band = band_cells * cell_world
    # per coarse cell: min |sdf| over its 8 corners (shifted-view min)
    a = np.abs(coarse)
    blk_min = a[:-1, :-1, :-1]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx or dy or dz:
                    blk_min = np.minimum(
                        blk_min, a[dx:dx + nb, dy:dy + nb, dz:dz + nb])
    active = blk_min < band
    # dilate by one block (6-neighborhood) so the binary smoothing kernel
    # never straddles an exact/upsampled seam right at the surface
    d = active.copy()
    for axis in range(3):
        d |= np.roll(active, 1, axis=axis) | np.roll(active, -1, axis=axis)
    # np.roll wraps; sdf is positive at the boundary shells so wrap-on is
    # harmless (only adds evaluations)
    ids = np.argwhere(d).astype(np.int32)                      # (K, 3)
    t0 = _prof(f"sparse: band select ({len(ids)} blocks)", t0)

    # dispatch the fine launches BEFORE the big host fill below: the
    # ~0.5 GB fill then overlaps the device's band evaluation instead of
    # serializing ahead of it (grid-phase decomposition, r5)
    futs = []
    if len(ids):
        level_mask = progressive_mask(cfg.sdf.grid, jnp.asarray(step))
        n_active = min(cfg.sdf.grid.current_level(step),
                       cfg.sdf.grid.n_levels)
        cb = max(1, 262144 // block ** 3)                      # pts/launch
        _eval = _block_eval_fn(cfg.sdf, block, cb, n_active)
        pad = (-len(ids)) % cb
        ids_p = np.concatenate([ids, np.repeat(ids[:1], pad, axis=0)],
                               axis=0) if pad else ids
        vmin_j, vmax_j = jnp.asarray(vmin), jnp.asarray(vmax)
        inv_denom = jnp.float32(1.0 / (R - 1))
        futs = [_eval(params, level_mask, jnp.asarray(part), vmin_j, vmax_j,
                      inv_denom)
                for part in ids_p.reshape(-1, cb, 3)]
        t0 = _prof(f"sparse: dispatch {len(futs)} fine launches", t0)

    # piecewise-constant fill from the cell's low corner — only the SIGN
    # matters off-band (sign-equivalent per the Lipschitz bound above).
    # Single-pass broadcast materialization: the old repeat×3 chain wrote
    # ~0.8 GB of intermediates for the same 0.5 GB result
    grid = np.ascontiguousarray(np.broadcast_to(
        coarse[:-1, None, :-1, None, :-1, None],
        (nb, block, nb, block, nb, block))).reshape(R, R, R)
    t0 = _prof("sparse: fill", t0)
    if not futs:
        return grid

    vals = [np.asarray(f, dtype=np.float32) for f in futs]
    t0 = _prof("sparse: fetch fine launches", t0)
    vals = np.concatenate(vals, axis=0)[:len(ids)]             # (K, b³)
    gview = grid.reshape(nb, block, nb, block, nb, block)
    gview[ids[:, 0], :, ids[:, 1], :, ids[:, 2], :] = \
        vals.reshape(-1, block, block, block)
    _prof("sparse: scatter", t0)
    return grid


@lru_cache(maxsize=8)
def _smooth_pack_fn(R: int, block: int, kpad: int, sigma: float = 1.0,
                    radius: int = 4):
    """Jitted device program: sparse grid pieces → carved, gaussian-
    smoothed occupancy, quantized u8 (VERDICT r4 next #2, r5).

    Replaces the HOST half of the old export chain — 0.5 GB fill +
    scatter + binary astype + scipy gaussian (5-15 s on the 1-core host)
    — with device ops on data that is already there, shipping ONE
    (R,R,R) u8 D2H instead of raw block values. Marching consumes
    u8/255 directly; u8 quantization moves crossing vertices ≤ 0.2% of
    a cell (the gaussian is itself an approximation of mcubes.smooth,
    PARITY.md).

    Boundary semantics: symmetric padding per axis — exactly scipy
    gaussian_filter's default 'reflect' mode (numpy 'symmetric'), so the
    device path matches the host chain even when occupancy touches a
    bbox face (equivalence-tested in tests/test_stage2_pipeline.py)."""
    ks = np.arange(-radius, radius + 1, dtype=np.float32)
    w = np.exp(-0.5 * (ks / sigma) ** 2)
    w = w / w.sum()
    # banded smoothing operator WITH the symmetric boundary folded in:
    # y[r] = Σ_k w[k] x[sym(r+k−radius)] — the 9-tap conv as ONE dense
    # (R,R) MXU matmul per axis (~140 GFLOP at R=512, ms-scale). No
    # jnp.pad: the symmetric-pad (and every conv/transpose) lowering
    # materialized a 73 GB [A,B,8,68,1] fusion on this toolchain.
    S = np.zeros((R, R), np.float32)           # [input p, output r]
    for r in range(R):
        for k in range(2 * radius + 1):
            p = r + k - radius
            if p < 0:
                p = -p - 1                     # scipy 'reflect' (symmetric)
            elif p >= R:
                p = 2 * R - 1 - p
            S[p, r] += w[k]
    S2 = jnp.asarray(S.T)                      # (R out, R in), left operand
    nb = R // block
    # block-replication operator: E[r, b] = 1 ⟺ r // block == b — the
    # coarse fill cell→voxel expansion as a left-GEMM (conv_transpose was
    # the 73 GB fusion's true source)
    E = jnp.asarray((np.arange(R)[:, None] // block
                     == np.arange(nb)[None, :]).astype(np.float32))

    @jax.jit
    def _run(coarse, ids, vals, crop):
        # occupancy from the piecewise-constant coarse fill, overridden by
        # the evaluated band blocks (sign-equivalent off-band — the same
        # Lipschitz argument as eval_sdf_grid_sparse).
        # LAYOUT RULE (cost of violating: 16 GB): every (R³)-scale tensor
        # must keep a ≥128 trailing dim — a (nb,4,nb,4,nb,4) scatter
        # target tiles its trailing 4s at 32× padding. The fill therefore
        # runs as a stride-4 transposed conv (streamed), and the block
        # override scatters 4³ WINDOWS into the (R,R,R) spatial layout.
        cell = (coarse[:-1, :-1, :-1] <= 0).astype(jnp.float32)
        # cell (nb,nb,nb) → (R,R,R): three rotating left-GEMMs with the
        # replication operator (same rotation identity as the smoothing
        # passes below — three last-axis expansions restore axis order)
        base = cell                              # (nb, nb, nb) → (R, R, R)
        for _ in range(3):
            a, b, c = base.shape
            y = jax.lax.dot_general(E, base.reshape(a * b, c),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            base = y.reshape(R, a, b)
        bs = (vals <= 0).astype(jnp.float32).reshape(
            kpad, block, block, block)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2))
        x = jax.lax.scatter(
            base, ids * block, bs, dnums,
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP)
        x = x * (crop[:, None, :] > 0.5)          # front-mask carve
        # separable gaussian as three banded MXU contractions over
        # symmetric padding (== scipy 'reflect'). Every prior form blew
        # up HBM at mc512: a slice-sum materialized 27 (R³) temporaries
        # (32 GB); the batched-1D conv, moveaxis+matmul, and any
        # dot_general contracting a NON-MINOR axis all produced the same
        # 73 GB transpose/conv fusion. The one clean shape is both
        # operands contracting their MINOR dims: y = S2 (R, R+2r) ·
        # xp (A, B, R+2r) → (r, A, B). Each pass thereby ROTATES the
        # axes forward, and three passes (z, then y, then x — always the
        # current last axis) restore the original (x, y, z) order with
        # zero transposes.
        # three boundary-folded band GEMMs, each contracting the CURRENT
        # last axis from the left: output axes rotate forward, so three
        # passes (z, y, x) restore the original (x, y, z) order with zero
        # transposes and zero pads.
        for _ in range(3):
            y = jax.lax.dot_general(S2, x.reshape(R * R, R),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = y.reshape(R, R, R)
        return jnp.round(x * 255.0).astype(jnp.uint8)

    return _run


def front_crop(front_mask: np.ndarray, vmin: np.ndarray, vmax: np.ndarray,
               resolution: int) -> np.ndarray:
    """The [x, z] carve mask resampled to the fine grid's bbox (reference
    geometry.py mask crop semantics; shared by the host and device export
    paths)."""
    size = front_mask.shape[0] / 2
    x0 = int(np.floor(vmin[0] * size + size))
    x1 = int(np.ceil(vmax[0] * size + size))
    z0 = int(np.floor(vmin[2] * size + size))
    z1 = int(np.ceil(vmax[2] * size + size))
    crop = front_mask[max(x0, 0):x1, max(z0, 0):z1]
    from PIL import Image
    return np.asarray(Image.fromarray(
        (np.clip(crop, 0, 1) * 255).astype(np.uint8)).resize(
        (resolution, resolution), Image.BICUBIC), np.float32)


def eval_smoothed_grid_sparse(cfg: nsr.NSRConfig, params, vmin: np.ndarray,
                              vmax: np.ndarray, resolution: int,
                              step: int = 10 ** 9,
                              front_mask: Optional[np.ndarray] = None,
                              block: int = 4, band_cells: float = 2.0
                              ) -> np.ndarray:
    """Device-side variant of ``eval_sdf_grid_sparse`` + carve + smooth:
    returns the QUANTIZED SMOOTHED occupancy (R,R,R) u8 (field = u8/255,
    march at 0.5) with the fine-block values never leaving the device."""
    R = resolution
    assert R % block == 0, (R, block)
    nb = R // block
    rc = nb + 1
    t0 = time.time()
    # coarse grid through the BLOCK evaluator: the device-smooth path then
    # uses ONE field program per uid (the slab evaluator's per-uid service
    # reload measured ~8 s, r5 profile)
    coarse = eval_sdf_grid_blocks(cfg, params, vmin, vmax, rc, step=step)
    t0 = _prof("dsmooth: coarse eval", t0)

    cell_world = float(np.max((vmax - vmin) / (rc - 1)))
    band = band_cells * cell_world
    a = np.abs(coarse)
    blk_min = a[:-1, :-1, :-1]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx or dy or dz:
                    blk_min = np.minimum(
                        blk_min, a[dx:dx + nb, dy:dy + nb, dz:dz + nb])
    active = blk_min < band
    d = active.copy()
    for axis in range(3):
        d |= np.roll(active, 1, axis=axis) | np.roll(active, -1, axis=axis)
    ids = np.argwhere(d).astype(np.int32)
    t0 = _prof(f"dsmooth: band select ({len(ids)} blocks)", t0)

    level_mask = progressive_mask(cfg.sdf.grid, jnp.asarray(step))
    n_active = min(cfg.sdf.grid.current_level(step), cfg.sdf.grid.n_levels)
    cb = max(1, 262144 // block ** 3)
    _eval = _block_eval_fn(cfg.sdf, block, cb, n_active)
    # bucket the block count so _smooth_pack_fn compiles per BUCKET, not
    # per uid (character active fractions vary a little run to run)
    bucket = 16384
    kpad = max(cb, ((len(ids) + bucket - 1) // bucket) * bucket)
    ids_p = np.concatenate(
        [ids, np.repeat(ids[:1] if len(ids) else
                        np.zeros((1, 3), np.int32), kpad - len(ids), axis=0)])
    vmin_j, vmax_j = jnp.asarray(vmin), jnp.asarray(vmax)
    inv_denom = jnp.float32(1.0 / (R - 1))
    futs = [_eval(params, level_mask, jnp.asarray(part), vmin_j, vmax_j,
                  inv_denom)
            for part in ids_p.reshape(-1, cb, 3)]
    t0 = _prof(f"dsmooth: dispatch {len(futs)} fine launches", t0)

    crop = front_crop(front_mask, vmin, vmax, R) / 255.0 \
        if front_mask is not None else np.ones((R, R), np.float32)
    if _PROF_EXPORT:
        np.asarray(futs[-1][:1, :1])          # sync: fine-eval compute
        t0 = _prof("dsmooth: fine eval compute", t0)
    vals_dev = jnp.concatenate(futs, axis=0).astype(jnp.float32)
    smooth = _smooth_pack_fn(R, block, kpad)
    out = smooth(jnp.asarray(coarse), jnp.asarray(ids_p), vals_dev,
                 jnp.asarray(crop))
    if _PROF_EXPORT:
        np.asarray(out[:1, :1, :1])           # sync: isolates exec vs D2H
        t0 = _prof("dsmooth: smooth+pack exec", t0)
    out_np = np.asarray(out)
    _prof("dsmooth: fetch u8 field", t0)
    return out_np


def _bbox_pass(cfg: nsr.NSRConfig, params, resolution: int, step: int,
               sparse: bool, use_blocks: bool = False
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Coarse full-extent pass → (vmin, vmax) of the smoothed negative
    region + 10% margin (the same support the old marching-tets bbox
    extraction spanned, without building the coarse MESH).

    use_blocks: evaluate through the BLOCK program (the device-smooth
    path's only field-eval program — the slab evaluator would otherwise
    pay its ~8 s per-uid service reload just for this pass)."""
    r = cfg.radius
    # bbox pass resolution: match the sparse path's coarse resolution
    # (R/4+1, e.g. 129 at mc512) so both passes execute the SAME program
    coarse_res = resolution // 4 + 1 if sparse else min(resolution, 128)
    t0 = time.time()
    lo, hi = np.array([-r] * 3, np.float32), np.array([r] * 3, np.float32)
    if use_blocks:
        level = eval_sdf_grid_blocks(cfg, params, lo, hi, coarse_res,
                                     step=step)
    else:
        level = eval_sdf_grid(cfg, params, lo, hi, coarse_res, step=step)
    t0 = _prof(f"bbox: coarse eval ({coarse_res})", t0)
    from scipy.ndimage import gaussian_filter
    neg = np.argwhere(gaussian_filter((level <= 0).astype(np.float32),
                                      1.0) > 0.5)
    if len(neg) == 0:
        raise RuntimeError("empty isosurface (no negative SDF region)")
    v_lo = neg.min(0) / (coarse_res - 1) * 2 * r - r
    v_hi = neg.max(0) / (coarse_res - 1) * 2 * r - r
    vmin = np.clip(v_lo - (v_hi - v_lo) * 0.1, -r, r).astype(np.float32)
    vmax = np.clip(v_hi + (v_hi - v_lo) * 0.1, -r, r).astype(np.float32)
    _prof("bbox: bounds", t0)
    return vmin, vmax


def isosurface_device(cfg: nsr.NSRConfig, params, resolution: int = 512,
                      step: int = 10 ** 9,
                      front_mask: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device-smooth export front half: bbox → sparse fine eval → carve +
    gaussian smooth + u8 quantize ON DEVICE. Returns (smoothed_u8, vmin,
    vmax); feed to ``isosurface_from_smoothed``. Requires the sparse-path
    resolution contract (R ≥ 256, R % 4 == 0)."""
    vmin, vmax = _bbox_pass(cfg, params, resolution, step, sparse=True,
                            use_blocks=True)
    smoothed = eval_smoothed_grid_sparse(cfg, params, vmin, vmax, resolution,
                                         step=step, front_mask=front_mask)
    return smoothed, vmin, vmax


def isosurface_from_smoothed(smoothed_u8: np.ndarray, vmin: np.ndarray,
                             vmax: np.ndarray, resolution: int,
                             face_count: int = 50000,
                             remeshing: bool = True
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Host half of the device-smooth path: march the quantized smoothed
    field (carve + smooth already applied on device) + quadric remesh."""
    t0 = time.time()
    from drawingspinup_tpu.render.marching import marching_tetrahedra
    # u8 marched natively without a 0.5 GB f32 conversion (levels rescale)
    verts, faces = marching_tetrahedra(smoothed_u8, 0.5)
    t0 = _prof(f"march: tets ({len(faces)} faces)", t0)
    verts = verts / (resolution - 1)
    verts = vmin[None, :] + verts * (vmax - vmin)[None, :]
    if remeshing and len(faces) > face_count:
        verts, faces = mesh_post.remesh(verts, faces, face_count)
    _prof(f"march: remesh (→{len(faces)})", t0)
    return verts, faces


def isosurface_level(cfg: nsr.NSRConfig, params, resolution: int = 512,
                     step: int = 10 ** 9, sparse: Optional[bool] = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The DEVICE half of the export: coarse pass → bbox → fine SDF grid.
    Returns (level (R³ float32), vmin, vmax). The remaining work
    (carve/march/remesh, ``isosurface_from_level``) is host-only, so a
    sweep can overlap it with the next uid's training."""
    if sparse is None:
        sparse = resolution >= 256 and resolution % 4 == 0
    vmin, vmax = _bbox_pass(cfg, params, resolution, step, sparse)

    if sparse:
        level = eval_sdf_grid_sparse(cfg, params, vmin, vmax, resolution,
                                     step=step)
    else:
        level = eval_sdf_grid(cfg, params, vmin, vmax, resolution, step=step)
    return level, vmin, vmax


def isosurface_from_level(level: np.ndarray, vmin: np.ndarray,
                          vmax: np.ndarray, resolution: int,
                          front_mask: Optional[np.ndarray] = None,
                          face_count: int = 50000, remeshing: bool = True
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Host half: front-mask carving, binary smoothing + marching
    tetrahedra, quadric remesh."""
    t0 = time.time()
    binary = (level <= 0)
    if front_mask is not None:
        size = front_mask.shape[0] / 2
        x0 = int(np.floor(vmin[0] * size + size))
        x1 = int(np.ceil(vmax[0] * size + size))
        z0 = int(np.floor(vmin[2] * size + size))
        z1 = int(np.ceil(vmax[2] * size + size))
        crop = front_mask[max(x0, 0):x1, max(z0, 0):z1]
        from PIL import Image
        crop = np.asarray(Image.fromarray(
            (np.clip(crop, 0, 1) * 255).astype(np.uint8)).resize(
            (resolution, resolution), Image.BICUBIC), np.float32)
        # broadcast, don't tile: np.tile materialized a second res³ bool
        binary = binary & (crop[:, None, :] > 127)
    t0 = _prof("march: carve", t0)

    from drawingspinup_tpu.render.marching import smooth_binary
    smoothed = smooth_binary(binary.astype(np.float32), 1.0)
    t0 = _prof("march: smooth", t0)
    from drawingspinup_tpu.render.marching import marching_tetrahedra
    verts, faces = marching_tetrahedra(smoothed, 0.5)
    t0 = _prof(f"march: tets ({len(faces)} faces)", t0)
    verts = verts / (resolution - 1)
    verts = vmin[None, :] + verts * (vmax - vmin)[None, :]
    if remeshing and len(faces) > face_count:
        verts, faces = mesh_post.remesh(verts, faces, face_count)
    _prof(f"march: remesh (→{len(faces)})", t0)
    return verts, faces


def isosurface(cfg: nsr.NSRConfig, params, resolution: int = 512,
               front_mask: Optional[np.ndarray] = None,
               face_count: int = 50000, remeshing: bool = True,
               step: int = 10 ** 9, sparse: Optional[bool] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Two-pass (coarse → bbox → fine) extraction with optional front-mask
    carving, smoothing of the binary field, and quadric remesh.

    step: progressive-band state for the mask — pass the FINAL TRAINING step
    so hash levels never unlocked during training stay masked at export
    (reference ProgressiveBandHashGrid keeps its mask at test time; an
    all-ones mask would leak init noise from untrained tables)."""
    level, vmin, vmax = isosurface_level(cfg, params, resolution, step,
                                         sparse)
    return isosurface_from_level(level, vmin, vmax, resolution, front_mask,
                                 face_count, remeshing)


# ---------------------------------------------------------------------------
# top-level per-uid reconstruction
# ---------------------------------------------------------------------------

def export_name(max_steps: int, mc_res: int, face_count: int, cutting: bool,
                remeshing: bool, thinning: bool, smoothing: bool,
                color_bp: bool) -> str:
    """Reference save-name builder (neus_ortho.py:182-200)."""
    name = f"it{max_steps}-mc{mc_res}-f{face_count}"
    if cutting:
        name += "_c"
    if remeshing:
        name += "_r"
    if thinning:
        name += "_t"
    if smoothing:
        name += "_s"
    name += "_cbp" if color_bp else ""
    return name


_PREWARMED: set = set()


def prewarm(cfg: nsr.NSRConfig, im_size: int = 1024,
            mc_resolution: int = 512, n_views: int = 6) -> float:
    """Force the per-process device-program loads for the canonical recon
    shapes (VERDICT r3 next #5 — cold-start attack).

    The persistent compile cache makes compiles cheap, but the remote
    service loads each program on its FIRST execution in a process
    (~tens of seconds for the big ones, PERF_NOTES.md) — the entire
    cold-vs-warm recon gap. This dispatches one dummy execution of every
    program the real per-uid loop will run — hull march, each
    progressive-band phase's train step, and the export grid evals — on
    zeros-data at the exact production shapes (same memoized optimizer,
    same data dict keys, same n_active statics ⇒ the identical programs).
    Called from a background thread by cli/recon.py so the loads overlap
    data IO and the first training phase. Returns elapsed seconds.

    Once per process per config: a sweep invokes the recon CLI once per
    uid, and the dummy grid eval alone is ~15 s of device work — repeat
    calls are no-ops (the programs are already resident)."""
    pw_key = (cfg, im_size, mc_resolution, n_views)
    if pw_key in _PREWARMED:
        return 0.0
    _PREWARMED.add(pw_key)
    t0 = time.time()
    c2ws, _ = view_matrices(SIX_VIEWS[:n_views])
    data = {
        "images": jnp.zeros((n_views, im_size, im_size, 3), jnp.float32),
        "normals": jnp.zeros((n_views, im_size, im_size, 3), jnp.float32),
        "masks": jnp.ones((n_views, im_size, im_size), jnp.float32),
        "view_weights": jnp.ones((n_views,), jnp.float32),
        "c2w": jnp.asarray(c2ws, jnp.float32),
    }
    if cfg.hull_trange:
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data["t_range"] = hull_t_ranges(data["masks"], data["c2w"],
                                        cfg.radius)
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    phases = sorted({cfg.sdf.grid.current_level(s)
                     for s in range(cfg.max_steps)})
    n_dev = len(jax.devices())
    for n_active in phases:
        if n_dev > 1:
            from drawingspinup_tpu.train import nsr_parallel
            step_fn = nsr_parallel.production_train_step(
                cfg, tx, n_active=n_active)
            state2, logs = step_fn(state, data, key)
        else:
            state2, logs = nsr.train_step(cfg, tx, state, data, key,
                                          n_active=n_active)
    # export grid programs (coarse + surface-band fine blocks [+ the
    # device smooth/pack]) on the sphere-initialized SDF — realistic
    # occupancy, same program shapes as the production export path
    if (mc_resolution >= 256 and mc_resolution % 4 == 0
            and os.environ.get("DSU_DEVICE_SMOOTH", "1") not in ("", "0")):
        isosurface_device(cfg, state.params, resolution=mc_resolution,
                          step=cfg.max_steps)
    else:
        isosurface_level(cfg, state.params, resolution=mc_resolution,
                         step=cfg.max_steps)
    float(logs["loss"])          # settle the queue
    dt = time.time() - t0
    print(f"[recon] prewarm: programs loaded in {dt:.1f} s")
    return dt


def recon_uid(root: str, uid: str, cfg: nsr.NSRConfig, *,
              mc_resolution: int = 512, face_count: int = 50000,
              thinning: bool = False, thinning_type: str = "double",
              smoothing: bool = True, shearing: bool = True,
              color_back_projection: bool = True, ortho_scale: float = 1.35,
              front_cutting: bool = True, seed: int = 123456,
              im_size: int = 1024, log_every: int = 100,
              export_uv: bool = False, tail_executor=None) -> str:
    """Train NeuS on one uid's mv/ set and export the post-processed mesh.

    tail_executor: optional concurrent.futures.Executor. The export's host
    half (carve/march/remesh/save_mesh, ~25-40 s) has no device work when
    color_back_projection is on, so a multi-uid caller can hand in a
    single-worker executor and overlap it with the NEXT uid's training
    (the training loop is RPC-wait, not CPU) — a Future[str] is returned
    instead of the path. cli/recon.py does this in multi-uid mode."""
    t_entry = time.time()
    paths = UidPaths(root, uid)
    data = load_ortho_data(paths, im_size=im_size, radius=cfg.radius,
                           hull_trange=cfg.hull_trange)
    front_mask = load_front_mask(paths)
    t_data = time.time() - t_entry

    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(seed))

    # checkpoint/resume (reference: PL every_n_train_steps=max_steps +
    # unused load_from_checkpoint hook — here resume actually works)
    from drawingspinup_tpu.core import checkpoint as ckpt
    ckpt_root = os.path.join(paths.mesh_dir, "ckpt")
    start_step = 0
    latest = ckpt.latest_step(ckpt_root)
    if latest is not None and latest <= cfg.max_steps:
        # checkpoints carry params+step only: the single save happens AT
        # max_steps (reference every_n_train_steps=max_steps), after which
        # no optimizer step ever runs again — the Adam moments were ~4× the
        # params' D2H bytes (~10 s of the stage wall) for nothing. Resume
        # therefore means "training done, re-export". Old full-TrainState
        # dirs restore through the fallback.
        try:
            restored = ckpt.restore(ckpt.step_path(ckpt_root, latest),
                                    {"params": state.params})
            state = state._replace(params=restored["params"])
        except Exception:
            state = ckpt.restore(ckpt.step_path(ckpt_root, latest), state)
        state = state._replace(step=jnp.asarray(latest, jnp.int32))
        start_step = latest
        print(f"[recon {uid}] resumed from step {latest}")

    # multi-chip: rays data-parallel over all local devices (ICI dp axis) —
    # the dryrun_multichip entry validates this exact production path
    n_dev = len(jax.devices())
    if n_dev > 1:
        from drawingspinup_tpu.train import nsr_parallel
        print(f"[recon {uid}] data-parallel over {n_dev} devices")

    key = jax.random.PRNGKey(seed + 1)
    for _ in range(start_step):
        key, _k = jax.random.split(key)  # keep the key stream aligned
    t0 = time.time()
    for step in range(start_step, cfg.max_steps):
        key, k = jax.random.split(key)
        # static active-level count: locked hash levels are elided from the
        # graph (no gathers/scatters); recompiles once per unlock, amortized
        # by the persistent compilation cache
        n_active = cfg.sdf.grid.current_level(step)
        if n_dev > 1:
            dp_step = nsr_parallel.production_train_step(cfg, tx,
                                                         n_active=n_active)
            state, logs = dp_step(state, data, k)
        else:
            state, logs = nsr.train_step(cfg, tx, state, data, k,
                                         n_active=n_active)
        if log_every and step % log_every == 0:
            print(f"[recon {uid}] step {step}: "
                  f"loss={float(logs['loss']):.4f} "
                  f"mask={float(logs['loss_mask']):.4f} "
                  f"inv_s={float(logs['inv_s']):.1f}")
    train_time = time.time() - t0

    # Checkpoint scheduling (r5): the save's params D2H used to start
    # BEFORE the grid eval, contending with the grid's ~34 MB-per-program
    # D2H on the single device tunnel (grid 14.7 s in-suite vs 10.4
    # uncontended) and then billing its commit remainder inline (~9 s).
    # Now a background thread starts AFTER the grid eval — D2H runs over an
    # idle tunnel while the host-only march/remesh computes — and is
    # settled at the end of the host tail. The reference contract is ONE
    # save per run (neuralangelo-ortho-wmask.yaml every_n_train_steps =
    # max_steps), so nothing else ever waits on it.
    import threading
    ckpt_info: Dict[str, object] = {"seconds": 0.0, "error": None}

    def _ckpt_saver() -> None:
        t0 = time.time()
        try:
            host_params = jax.device_get(state.params)
            ckpt.save(ckpt.step_path(ckpt_root, cfg.max_steps),
                      {"params": host_params})
        except Exception as e:               # surfaced at settle time
            ckpt_info["error"] = e
        ckpt_info["seconds"] = time.time() - t0

    # device-smooth export (r5): carve + gaussian smoothing run on device
    # inside the grid phase, removing the host fill/scatter/smooth chain
    # (5-15 s of the 1-core host's march phase). DSU_DEVICE_SMOOTH=0
    # falls back to the host chain.
    device_smooth = (mc_resolution >= 256 and mc_resolution % 4 == 0
                     and os.environ.get("DSU_DEVICE_SMOOTH", "1")
                     not in ("", "0"))
    ckpt_thread: Optional[threading.Thread] = None
    try:
        t0 = time.time()
        if device_smooth:
            level, vmin, vmax = isosurface_device(
                cfg, state.params, resolution=mc_resolution,
                step=cfg.max_steps,
                front_mask=front_mask if front_cutting else None)
        else:
            level, vmin, vmax = isosurface_level(cfg, state.params,
                                                 resolution=mc_resolution,
                                                 step=cfg.max_steps)
        t_grid = time.time() - t0
    finally:
        # the checkpoint MUST commit even if the grid eval dies (training
        # would otherwise be lost / sweep resume broken)
        if cfg.max_steps > start_step:
            ckpt_thread = threading.Thread(target=_ckpt_saver)
            ckpt_thread.start()
            if sys.exc_info()[0] is not None:
                # unwinding: settle now; the saver never raises (error is
                # stashed), so the original exception propagates untouched
                ckpt_thread.join()
                if ckpt_info["error"] is not None:
                    print(f"[recon] checkpoint commit failed while "
                          f"unwinding another error: {ckpt_info['error']!r}")

    def settle_ckpt() -> float:
        """Join the overlapped checkpoint commit; returns wall seconds it
        still cost on the critical path (0 when fully hidden)."""
        if ckpt_thread is None:
            return 0.0
        t0 = time.time()
        ckpt_thread.join()
        if ckpt_info["error"] is not None:
            raise RuntimeError("checkpoint commit failed") \
                from ckpt_info["error"]      # mesh is already on disk
        return time.time() - t0

    front_color = read_image(paths.mv("color", "front"))[..., :3] \
        if color_back_projection else None
    back_color = read_image(paths.mv("color", "back"))[..., :3] \
        if color_back_projection else None
    drawing_mask = read_image(paths.mask)[..., 0] \
        if os.path.exists(paths.mask) else None

    name = export_name(cfg.max_steps, mc_resolution, face_count,
                       front_cutting, True, thinning, smoothing,
                       color_back_projection)
    out_path = os.path.join(paths.mesh_dir, name + ".obj")

    def host_tail() -> str:
        t0 = time.time()
        if device_smooth:
            verts, faces = isosurface_from_smoothed(
                level, vmin, vmax, mc_resolution, face_count=face_count)
        else:
            verts, faces = isosurface_from_level(
                level, vmin, vmax, mc_resolution,
                front_mask=front_mask if front_cutting else None,
                face_count=face_count)
        t_march = time.time() - t0
        # colors for the non-backprojection path: albedo from the radiance
        # field (device eval — this branch never runs deferred)
        vert_colors = None
        if not color_back_projection:
            from drawingspinup_tpu.models.fields import (
                radiance_forward, sdf_with_grad,
            )
            # band mask frozen at the final training step (untrained levels
            # stay masked — reference keeps ProgressiveBandHashGrid's mask
            # at test)
            level_mask = progressive_mask(cfg.sdf.grid,
                                          jnp.asarray(cfg.max_steps))
            sdf, grad, feat = sdf_with_grad(
                cfg.sdf, state.params["geometry"], jnp.asarray(verts), 1e-3,
                level_mask)
            n = grad / jnp.maximum(
                jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
            vert_colors = np.asarray(radiance_forward(
                cfg.radiance, state.params["texture"], feat, -n, n))
        t1 = time.time()
        mesh_post.save_mesh(
            out_path, verts, faces, vert_colors=vert_colors,
            front_mask=drawing_mask, front_color=front_color,
            back_color=back_color, thinning=thinning,
            thinning_type=thinning_type, smoothing=smoothing,
            color_back_projection=color_back_projection, shearing=shearing,
            ortho_scale=ortho_scale, export_uv=export_uv)
        t_save = time.time() - t1
        t_ckpt_wall = settle_ckpt()          # usually 0: hidden under march
        print(f"[recon {uid}] trained {cfg.max_steps} steps in "
              f"{train_time:.1f}s → {out_path}\n"
              f"[recon {uid}] phases: data+hull {t_data:.1f}s  "
              f"ckpt {t_ckpt_wall:.1f}s (overlapped, "
              f"{float(ckpt_info['seconds']):.1f}s total)  "
              f"grid {t_grid:.1f}s  "
              f"march+remesh {t_march:.1f}s  save_mesh {t_save:.1f}s")
        return out_path

    if tail_executor is not None and color_back_projection:
        return tail_executor.submit(host_tail)
    return host_tail()


def nsr_config_from_yaml(cfg: Config) -> nsr.NSRConfig:
    """Map the reference neuralangelo-ortho-wmask.yaml knobs → NSRConfig."""
    import dataclasses

    from drawingspinup_tpu.models.fields import (
        MLPConfig, RadianceConfig, SDFFieldConfig,
    )
    from drawingspinup_tpu.models.hashgrid import HashGridConfig

    m = cfg.get("model", Config())
    geo = m.get("geometry", Config())
    enc = geo.get("xyz_encoding_config", Config())
    mlp = geo.get("mlp_network_config", Config())
    tex = m.get("texture", Config())
    tmlp = tex.get("mlp_network_config", Config())
    loss = cfg.get("system", Config()).get("loss", Config())
    trainer = cfg.get("trainer", Config())
    optp = cfg.get("system", Config()).get("optimizer", Config()) \
        .get("params", Config())

    grid = HashGridConfig(
        n_levels=enc.get("n_levels", 10),
        n_features_per_level=enc.get("n_features_per_level", 2),
        log2_hashmap_size=enc.get("log2_hashmap_size", 19),
        base_resolution=enc.get("base_resolution", 32),
        per_level_scale=enc.get("per_level_scale", 1.3195079107728942),
        include_xyz=enc.get("include_xyz", True),
        start_level=enc.get("start_level", 4),
        start_step=enc.get("start_step", 0),
        update_steps=enc.get("update_steps", 1000),
        table_dtype=enc.get("table_dtype", "float32"),
        compute_dtype=enc.get("compute_dtype", "float32"),
        dense_max_rows=int(enc.get("dense_max_rows", 0)),
    )
    sdf = SDFFieldConfig(
        radius=m.get("radius", 1.0),
        feature_dim=geo.get("feature_dim", 13),
        grid=grid,
        mlp=MLPConfig(n_neurons=mlp.get("n_neurons", 64),
                      n_hidden_layers=mlp.get("n_hidden_layers", 1),
                      sphere_init=mlp.get("sphere_init", True),
                      sphere_init_radius=mlp.get("sphere_init_radius", 0.5),
                      weight_norm=mlp.get("weight_norm", True)),
    )
    radiance = RadianceConfig(
        input_feature_dim=tex.get("input_feature_dim",
                                  geo.get("feature_dim", 13) + 3),
        mlp=MLPConfig(n_neurons=tmlp.get("n_neurons", 64),
                      n_hidden_layers=tmlp.get("n_hidden_layers", 2),
                      output_activation="sigmoid"),
    )
    lw = nsr.LossWeights(
        lambda_rgb_mse=loss.get("lambda_rgb_mse", 0.5),
        lambda_rgb_l1=loss.get("lambda_rgb_l1", 0.0),
        lambda_mask=loss.get("lambda_mask", 1.0),
        lambda_eikonal=loss.get("lambda_eikonal", 0.2),
        lambda_normal=loss.get("lambda_normal", 1.0),
        lambda_3d_normal_smooth=loss.get("lambda_3d_normal_smooth", 1.0),
        lambda_sparsity=loss.get("lambda_sparsity", 0.5),
        sparsity_scale=loss.get("sparsity_scale", 100.0),
        geo_aware=loss.get("geo_aware", True),
        rgb_p_ratio=loss.get("rgb_p_ratio", 0.8),
        normal_p_ratio=loss.get("normal_p_ratio", 0.8),
        mask_p_ratio=loss.get("mask_p_ratio", 0.9),
    )
    return nsr.NSRConfig(
        radius=m.get("radius", 1.0),
        sdf=sdf, radiance=radiance,
        variance_init=m.get("variance", Config()).get("init_val", 0.3),
        cos_anneal_end=m.get("cos_anneal_end", 20000),
        train_num_rays=m.get("train_num_rays_fixed", 2048),
        n_coarse=m.get("n_coarse", 64),
        n_fine=m.get("n_fine", 64),
        hull_trange=m.get("hull_trange", True),
        randomized=m.get("randomized", True),
        loss=lw,
        max_steps=trainer.get("max_steps", 3000),
        constant_steps=cfg.get("system", Config()).get("constant_steps", 500),
        lr_geometry=optp.get("geometry", Config()).get("lr", 1e-3),
        lr_texture=optp.get("texture", Config()).get("lr", 1e-2),
        lr_variance=optp.get("variance", Config()).get("lr", 1e-3),
        ray_chunk=m.get("ray_chunk", 4096),
    )
