"""NSR (NeuS) reconstruction trainer — one jitted step, fixed shapes.

Replaces the reference's PyTorch-Lightning system
(``instant_nsr/systems/neus_ortho.py`` + ``recon.py:25-41``): ray sampling,
rendering, the full loss set and the optimizer all live inside a single
``train_step`` jitted over (params, opt_state, data, key, step), so the whole
3000-step run executes on-device with no per-step host round trips.

Divergences from the reference, by TPU design (SURVEY.md §7):
  * fixed ray/sample budget (coarse-uniform + inverse-CDF importance
    sampling) instead of occupancy-pruned ragged marching + dynamic ray-count
    growth; the per-step sample budget matches the reference's
    train_num_rays·num_samples_per_ray target.
  * pixels are sampled with jax.random inside the step; ortho ray origins are
    computed analytically from pixel coords (no stored ray grids).
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drawingspinup_tpu.models import fields
from drawingspinup_tpu.models.fields import (
    RadianceConfig, SDFFieldConfig, init_radiance, init_sdf_field,
    init_variance, inv_s, radiance_forward, sdf_forward, sdf_with_grad,
)
from drawingspinup_tpu.models.hashgrid import (
    finite_difference_eps, progressive_mask,
)
from drawingspinup_tpu.render import neus
from drawingspinup_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Reference configs/neuralangelo-ortho-wmask.yaml system.loss block."""
    lambda_rgb_mse: float = 0.5
    lambda_rgb_l1: float = 0.0
    lambda_mask: float = 1.0
    lambda_eikonal: float = 0.2
    lambda_normal: float = 1.0
    lambda_3d_normal_smooth: float = 1.0
    lambda_sparsity: float = 0.5
    sparsity_scale: float = 100.0
    geo_aware: bool = True
    rgb_p_ratio: float = 0.8
    normal_p_ratio: float = 0.8
    mask_p_ratio: float = 0.9


@dataclasses.dataclass(frozen=True)
class NSRConfig:
    radius: float = 1.0
    sdf: SDFFieldConfig = SDFFieldConfig()
    radiance: RadianceConfig = RadianceConfig()
    variance_init: float = 0.3
    cos_anneal_end: int = 20000
    train_num_rays: int = 2048
    n_coarse: int = 64
    n_fine: int = 64
    n_random_pts: int = 2048
    randomized: bool = True
    # attach static visual-hull [t_near, t_far] per ray at dataset load
    # (render/hull.py) — the TPU replacement for the reference's dynamic
    # occupancy pruning; lets n_coarse/n_fine drop 64/64 → 32/32 at equal
    # converged quality (scripts/{bench,convergence_ab}_hull.py)
    hull_trange: bool = True
    # analytic (TPU default: autodiff through the trilinear weights, no extra
    # gathers) | finite_difference (reference default; 7× field evals)
    grad_type: str = "analytic"
    loss: LossWeights = LossWeights()
    max_steps: int = 3000
    constant_steps: int = 500
    lr_geometry: float = 1e-3
    lr_texture: float = 1e-2
    lr_variance: float = 1e-3
    lr_decay_target: float = 0.1
    ray_chunk: int = 4096

    @property
    def n_samples(self) -> int:
        return self.n_coarse + self.n_fine


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_params(cfg: NSRConfig, key: jax.Array) -> Dict[str, Any]:
    """Jitted: ONE device program. Eager init dispatched ~100 tiny ops
    through the tunnel, each paying its own per-process first-execution
    load — a cold-start tax on every fresh recon process (PERF_NOTES
    'per-process first-execution cost')."""
    k1, k2 = jax.random.split(key)
    return {
        "geometry": init_sdf_field(cfg.sdf, k1),
        "texture": init_radiance(cfg.radiance, k2),
        "variance": init_variance(cfg.variance_init),
    }


@functools.lru_cache(maxsize=8)
def make_optimizer(cfg: NSRConfig) -> optax.GradientTransformation:
    """AdamW with per-submodule lrs + [constant → exponential-decay] schedule
    (reference system.optimizer/scheduler blocks; gamma chosen so lr decays
    by lr_decay_target over the remaining steps).

    Memoized on cfg: ``train_step`` hashes ``tx`` as a static argument by
    object identity, so a fresh optimizer per uid would retrace (and
    re-lookup) the train program for every uid of a sweep — and the
    cold-start prewarm must dispatch the EXACT program the real loop uses.
    optax transforms are stateless (pure init/update), so sharing is safe."""
    decay_steps = max(cfg.max_steps - cfg.constant_steps, 1)
    gamma = cfg.lr_decay_target ** (1.0 / decay_steps)

    def schedule(base_lr):
        def fn(step):
            s = jnp.asarray(step, jnp.float32)
            decayed = base_lr * gamma ** jnp.maximum(s - cfg.constant_steps, 0.0)
            return jnp.where(s < cfg.constant_steps, base_lr, decayed)
        return fn

    def adamw(lr):
        # mu_dtype f32: with bf16 hash tables the moments must not inherit
        # the storage dtype or Adam's EMA loses the small-gradient tail
        return optax.adamw(learning_rate=schedule(lr), b1=0.9, b2=0.99,
                           eps=1e-15, weight_decay=0.0,
                           mu_dtype=jnp.float32)

    return optax.multi_transform(
        {"geometry": adamw(cfg.lr_geometry),
         "texture": adamw(cfg.lr_texture),
         "variance": adamw(cfg.lr_variance)},
        param_labels={"geometry": "geometry", "texture": "texture",
                      "variance": "variance"},
    )


def init_state(cfg: NSRConfig, key: jax.Array) -> TrainState:
    params = init_params(cfg, key)
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.asarray(0, jnp.int32))


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def _occ_alpha(sdf: jnp.ndarray, step_size, s: jnp.ndarray) -> jnp.ndarray:
    """Normal-free alpha estimate used for importance weights / occupancy
    (reference occ_eval_fn, neus.py:74-84)."""
    prev_cdf = jax.nn.sigmoid((sdf + step_size * 0.5) * s)
    next_cdf = jax.nn.sigmoid((sdf - step_size * 0.5) * s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


def render_rays(cfg: NSRConfig, params, rays_o: jnp.ndarray,
                rays_d: jnp.ndarray, key: Optional[jax.Array],
                step: jnp.ndarray, train: bool,
                n_active: Optional[int] = None,
                t_range: Optional[jnp.ndarray] = None
                ) -> Dict[str, jnp.ndarray]:
    """rays_o/d: (R, 3) → composited rgb/normal/opacity/depth + training aux.

    Two-pass sampling: n_coarse stratified uniform (cheap sdf-only eval) →
    inverse-CDF importance resampling of n_fine → single full eval with
    finite-difference gradients over the merged, sorted sample set.

    n_active: STATIC count of unlocked hash levels (progressive band) — the
    gathers/scatters of locked levels are elided from the graph entirely
    (see hashgrid.encode). Must satisfy
    n_active ≥ cfg.sdf.grid.current_level(step) or features get zeroed that
    the band mask would keep.

    t_range: optional (R, 2) per-ray [t_near, t_far] (visual-hull intervals,
    render/hull.py) replacing the AABB span — the fixed sample budget then
    concentrates in the hull slab. The AABB hit flag is still what zeroes
    alpha for rays missing the scene box.
    """
    rkeys = jax.random.split(key, 3) if key is not None else [None] * 3
    level_mask = progressive_mask(cfg.sdf.grid, step)
    fd_eps = finite_difference_eps(cfg.sdf.grid, step, cfg.radius)
    s = inv_s(params["variance"])
    cos_anneal = jnp.where(
        cfg.cos_anneal_end == 0, 1.0,
        jnp.minimum(1.0, step.astype(jnp.float32) / cfg.cos_anneal_end))

    t_near, t_far = neus.aabb_intersect(rays_o, rays_d, cfg.radius)
    hit = (t_far > t_near).astype(jnp.float32)           # (R,)
    if t_range is not None:
        t_near, t_far = t_range[:, 0], t_range[:, 1]
    t_far = jnp.maximum(t_far, t_near + 1e-4)

    # ---- coarse pass (sdf only, no grads through it) ----
    t_c = neus.stratified_samples(rkeys[0], t_near, t_far, cfg.n_coarse,
                                  train and cfg.randomized)
    pos_c = rays_o[:, None, :] + rays_d[:, None, :] * t_c[..., None]
    step_c = (t_far - t_near)[:, None] / cfg.n_coarse
    sdf_c, _ = sdf_forward(cfg.sdf, jax.lax.stop_gradient(params["geometry"]),
                           pos_c.reshape(-1, 3), level_mask, n_active)
    sdf_c = sdf_c.reshape(t_c.shape)
    w_c = _occ_alpha(sdf_c, step_c, jax.lax.stop_gradient(s))

    # ---- importance resample + merge ----
    t_f = neus.sample_pdf(rkeys[1], t_c, jax.lax.stop_gradient(w_c),
                          cfg.n_fine, train and cfg.randomized)
    t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)  # (R, S)
    dists = jnp.diff(t_all, axis=-1)
    dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    pos = rays_o[:, None, :] + rays_d[:, None, :] * t_all[..., None]

    # ---- full eval with gradients ----
    # The sparsity/smoothness probe points are FOLDED into this eval:
    # separate 2×n_random_pts field calls measured ~110 ms/step (23%) on
    # v5e — thousands-of-points launches are launch-bound, while appending
    # them to the 262k-sample eval costs +1.6% (profile_nsr_parts.py).
    n_main = pos.shape[0] * pos.shape[1]
    if train:
        k_r1, k_r2 = jax.random.split(rkeys[2])
        probe_pts = jax.random.uniform(k_r1, (cfg.n_random_pts, 3),
                                       minval=-1.0, maxval=1.0)
        probe_perturbed = probe_pts + jax.random.normal(
            k_r2, probe_pts.shape) * 1e-2
        eval_pts = jnp.concatenate([pos.reshape(-1, 3), probe_pts,
                                    probe_perturbed], axis=0)
    else:
        eval_pts = pos.reshape(-1, 3)
    if cfg.grad_type == "finite_difference":
        field = partial(sdf_with_grad, cfg.sdf, params["geometry"],
                        eps=fd_eps, level_mask=level_mask, n_active=n_active)
        sdf_all, grad_all, feat_all = jax.checkpoint(
            lambda pts: field(pts))(eval_pts)
    else:
        field = partial(fields.sdf_with_grad_analytic, cfg.sdf,
                        params["geometry"], level_mask=level_mask,
                        n_active=n_active)
        sdf_all, grad_all, feat_all = field(eval_pts)
    sdf = sdf_all[:n_main]
    grad = grad_all[:n_main]
    feature = feat_all[:n_main]
    S = cfg.n_samples
    sdf = sdf.reshape(-1, S)
    grad_flat = grad
    grad = grad.reshape(-1, S, 3)
    normal = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)

    alpha = neus.neus_alpha(sdf, normal, dirs, dists, s, cos_anneal)
    alpha = alpha * hit[:, None]
    rgb = radiance_forward(cfg.radiance, params["texture"],
                           feature.reshape(-1, S, feature.shape[-1]),
                           dirs, normal)

    comp = neus.composite(alpha, {"rgb": rgb, "normal": normal,
                                  "depth": t_all[..., None]})
    comp_normal = comp["comp_normal"]
    comp["comp_normal"] = comp_normal / jnp.maximum(
        jnp.linalg.norm(comp_normal, axis=-1, keepdims=True), 1e-9)

    out = {
        "comp_rgb": comp["comp_rgb"],
        "comp_normal": comp["comp_normal"],
        "opacity": comp["opacity"],
        "depth": comp["comp_depth"],
        "inv_s": s,
        "num_samples": jnp.sum(jax.lax.stop_gradient(alpha) > 1e-4),
    }
    if train:
        out.update({
            "sdf_samples": sdf.reshape(-1),
            "sdf_grad_samples": grad_flat,
            "weights": comp["weights"].reshape(-1),
        })
        # random-point probes for sparsity + 3D normal smoothness (rows
        # appended to the main eval above)
        n_r = cfg.n_random_pts
        out.update({"random_sdf": sdf_all[n_main:n_main + n_r],
                    "random_sdf_grad": grad_all[n_main:n_main + n_r],
                    "normal_perturb": grad_all[n_main + n_r:]})
    return out


# ---------------------------------------------------------------------------
# pixel sampling + losses
# ---------------------------------------------------------------------------

def sample_pixel_rays(key: jax.Array, data: Dict[str, jnp.ndarray],
                      n_rays: int):
    """Random (view, y, x) pixels → world ortho rays + per-pixel targets.
    data: images (V,H,W,3), normals (V,H,W,3), masks (V,H,W),
    view_weights (V,), c2w (V,3,4)."""
    v, h, w = data["masks"].shape
    kv, ky, kx = jax.random.split(key, 3)
    vi = jax.random.randint(kv, (n_rays,), 0, v)
    yi = jax.random.randint(ky, (n_rays,), 0, h)
    xi = jax.random.randint(kx, (n_rays,), 0, w)

    ox = ((xi.astype(jnp.float32) + 0.5) / w - 0.5) * 2.0
    oy = ((yi.astype(jnp.float32) + 0.5) / h - 0.5) * 2.0
    origins = jnp.stack([ox, oy, jnp.zeros_like(ox)], axis=-1)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), origins.shape)

    c2w = data["c2w"][vi]                                # (R, 3, 4)
    rays_d = jnp.einsum("rij,rj->ri", c2w[:, :, :3], dirs)
    rays_o = jnp.einsum("rij,rj->ri", c2w[:, :, :3], origins) + c2w[:, :, 3]
    rays_d = rays_d / jnp.maximum(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-9)

    targets = {
        "rgb": data["images"][vi, yi, xi],
        "normal": data["normals"][vi, yi, xi],
        "mask": data["masks"][vi, yi, xi],
        "view_weights": data["view_weights"][vi],
    }
    if "t_range" in data:  # static: dict keys are fixed at trace time
        targets["t_range"] = data["t_range"][vi, yi, xi]
    return rays_o, rays_d, targets


def compute_losses(cfg: NSRConfig, out: Dict[str, jnp.ndarray],
                   targets: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    lw = cfg.loss
    cos = L.cosine_similarity(out["rays_d"], targets["normal"])
    cos = jnp.where(cos > -0.1, 0.0, cos)
    mask = (targets["mask"] > 0) & (cos < -0.1)

    rgb_err = jnp.sum((out["comp_rgb"] - targets["rgb"]) ** 2, axis=-1)
    loss_rgb_mse = L.ranking_loss(rgb_err, lw.rgb_p_ratio, mask=mask)

    rgb_l1 = jnp.sum(jnp.abs(out["comp_rgb"] - targets["rgb"]), axis=-1)
    loss_rgb_l1 = L.ranking_loss(rgb_l1, lw.rgb_p_ratio, mask=mask)

    normal_err = 1.0 - L.cosine_similarity(out["comp_normal"],
                                           targets["normal"])
    if lw.geo_aware:
        gw = jnp.exp(jnp.abs(cos))
        normal_err = normal_err * gw / jnp.sum(gw)
        loss_normal = L.ranking_loss(normal_err, lw.normal_p_ratio, mask=mask,
                                     extra_weights=targets["view_weights"],
                                     reduction="sum")
    else:
        loss_normal = L.ranking_loss(normal_err, lw.normal_p_ratio, mask=mask,
                                     extra_weights=targets["view_weights"])

    loss_eik = L.eikonal_loss(out["sdf_grad_samples"])
    opacity = jnp.clip(out["opacity"][..., 0], 1e-3, 1 - 1e-3)
    mask_err = L.binary_cross_entropy(opacity, targets["mask"].astype(jnp.float32))
    loss_mask = L.ranking_loss(mask_err, lw.mask_p_ratio,
                               extra_weights=targets["view_weights"])
    loss_sparse = L.sparsity_loss(out["random_sdf"], lw.sparsity_scale)
    loss_smooth = L.normal_smooth_loss(out["random_sdf_grad"],
                                       out["normal_perturb"])

    total = (loss_rgb_mse * lw.lambda_rgb_mse
             + loss_rgb_l1 * lw.lambda_rgb_l1
             + loss_normal * lw.lambda_normal
             + loss_eik * lw.lambda_eikonal
             + loss_mask * lw.lambda_mask
             + loss_sparse * lw.lambda_sparsity
             + loss_smooth * lw.lambda_3d_normal_smooth)
    logs = {"loss": total, "loss_rgb_mse": loss_rgb_mse,
            "loss_normal": loss_normal, "loss_eikonal": loss_eik,
            "loss_mask": loss_mask, "loss_sparsity": loss_sparse,
            "loss_3d_normal_smooth": loss_smooth, "inv_s": out["inv_s"],
            "num_samples": out["num_samples"].astype(jnp.float32)}
    return total, logs


@partial(jax.jit, static_argnames=("cfg", "tx", "n_active"))
def train_step(cfg: NSRConfig, tx, state: TrainState,
               data: Dict[str, jnp.ndarray], key: jax.Array,
               n_active: Optional[int] = None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One jitted optimization step. n_active (static): number of unlocked
    hash levels for this phase of the progressive band — the driver loop
    recompiles at each unlock (persistent cache amortizes this across uids)
    and locked levels cost zero gathers/scatters."""
    k_pix, k_render = jax.random.split(key)
    rays_o, rays_d, targets = sample_pixel_rays(k_pix, data,
                                                cfg.train_num_rays)
    t_range = targets.pop("t_range", None)

    def loss_fn(params):
        out = render_rays(cfg, params, rays_o, rays_d, k_render, state.step,
                          train=True, n_active=n_active, t_range=t_range)
        out["rays_d"] = rays_d
        return compute_losses(cfg, out, targets)

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), logs


@functools.lru_cache(maxsize=4)
def _render_chunk_fn(cfg: "NSRConfig"):
    """Cached jitted eval-render chunk: params/step are ARGUMENTS (a fresh
    per-call closure would retrace every call and lower the hash tables as
    constants through a host-side fetch — the tunnel anti-pattern
    pipelines/stage2_mv.py documents)."""
    @jax.jit
    def _render(params, ro, rd, step):
        return render_rays(cfg, params, ro, rd, None, step, train=False)
    return _render


def render_image(cfg: NSRConfig, params, c2w: np.ndarray, h: int, w: int,
                 step: int = 10 ** 9) -> Dict[str, np.ndarray]:
    """Full-frame eval render in ray chunks (reference ray_chunk eval path)."""
    from drawingspinup_tpu.render.cameras import ortho_ray_grid, rays_to_world
    origins, dirs = ortho_ray_grid(w, h)
    rays_o, rays_d = rays_to_world(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                                   np.asarray(c2w))
    n = rays_o.shape[0]
    chunks = []
    _chunk = _render_chunk_fn(cfg)
    step_dev = jnp.asarray(step, jnp.int32)

    def _render(ro, rd):
        return _chunk(params, ro, rd, step_dev)

    for i in range(0, n, cfg.ray_chunk):
        ro = jnp.asarray(rays_o[i:i + cfg.ray_chunk])
        rd = jnp.asarray(rays_d[i:i + cfg.ray_chunk])
        pad = cfg.ray_chunk - ro.shape[0]
        if pad:
            ro = jnp.pad(ro, ((0, pad), (0, 0)))
            rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        out = _render(ro, rd)
        chunks.append({k: np.asarray(v)[: cfg.ray_chunk - pad]
                       for k, v in out.items()
                       if k in ("comp_rgb", "comp_normal", "opacity", "depth")})
    merged = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    return {k: v.reshape(h, w, -1) for k, v in merged.items()}
