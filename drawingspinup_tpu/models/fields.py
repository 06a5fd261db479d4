"""Neural fields for NSR reconstruction: SDF geometry, radiance, variance.

Capability parity with the reference (``instant_nsr/models/``):
  * VolumeSDF (geometry.py:120-215): hash-grid encoding + 1-hidden MLP →
    (sdf, 13-dim feature); finite-difference gradients with progressive eps;
    laplace for smoothness; sphere init (softplus β=100, weight norm).
  * VolumeRadiance (texture.py:9-30): MLP(feature ⊕ normal ⊕ dirs) → rgb,
    sigmoid. (The reference fork concatenates raw dirs without SH encoding.)
  * VarianceNetwork (neus.py:12-40): single parameter, inv_s = exp(10·v).

Everything is a pure function over an explicit param pytree — no framework
modules — so train steps jit/shard cleanly and finite-difference probes reuse
one batched evaluation (all 6 offsets + center in a single MXU-friendly
batch) instead of the reference's sequential eval.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.models.hashgrid import (
    HashGridConfig, encode, finite_difference_eps, init_table, progressive_mask,
)


# ---------------------------------------------------------------------------
# MLP with sphere init + weight norm (reference network_utils.py:94-138)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLPConfig:
    n_neurons: int = 64
    n_hidden_layers: int = 1
    sphere_init: bool = False
    sphere_init_radius: float = 0.5
    weight_norm: bool = False
    output_activation: Optional[str] = None  # None | sigmoid


def init_mlp(cfg: MLPConfig, dim_in: int, dim_out: int,
             key: jax.Array) -> Dict[str, Any]:
    """Weights stored as V (and per-row gain g when weight_norm) per layer."""
    dims = [dim_in] + [cfg.n_neurons] * cfg.n_hidden_layers + [dim_out]
    layers = []
    for i, (di, do) in enumerate(zip(dims[:-1], dims[1:])):
        key, k1 = jax.random.split(key)
        is_first, is_last = i == 0, i == len(dims) - 2
        if cfg.sphere_init:
            if is_last:
                w = jax.random.normal(k1, (di, do)) * 1e-4 \
                    + math.sqrt(math.pi) / math.sqrt(di)
                b = jnp.full((do,), -cfg.sphere_init_radius)
            elif is_first:
                w = jnp.zeros((di, do))
                w = w.at[:3].set(jax.random.normal(k1, (3, do))
                                 * math.sqrt(2) / math.sqrt(do))
                b = jnp.zeros((do,))
            else:
                w = jax.random.normal(k1, (di, do)) * math.sqrt(2) / math.sqrt(do)
                b = jnp.zeros((do,))
        else:
            bound = math.sqrt(6.0 / di)  # kaiming_uniform(relu)
            w = jax.random.uniform(k1, (di, do), minval=-bound, maxval=bound)
            b = jnp.zeros((do,))
        layer = {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}
        if cfg.weight_norm:
            layer["g"] = jnp.linalg.norm(w, axis=0)  # per-output-column norm
        layers.append(layer)
    return {"layers": layers}


def apply_mlp(cfg: MLPConfig, params: Dict[str, Any],
              x: jnp.ndarray) -> jnp.ndarray:
    """Runs in the INPUT dtype (params are f32; they cast to h.dtype at the
    matmul with f32 accumulation) — a bf16 encoding keeps the whole field
    chain bf16, an f32 input reproduces the original f32 math exactly."""
    h = x
    cdt = h.dtype
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        w = layer["w"]
        if cfg.weight_norm:
            # weight-norm math in f32 on the f32 params, cast once
            w = w * (layer["g"] / (jnp.linalg.norm(w, axis=0) + 1e-12))
        h = jnp.dot(h, w.astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt) \
            + layer["b"].astype(cdt)
        if i < n - 1:
            if cfg.sphere_init:
                # softplus β=100: numerically = relu for |x|>~0.1
                h = jax.nn.softplus(100.0 * h) / 100.0
            else:
                h = jax.nn.relu(h)
    if cfg.output_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h


# ---------------------------------------------------------------------------
# SDF geometry field
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDFFieldConfig:
    radius: float = 1.0
    feature_dim: int = 13
    grid: HashGridConfig = HashGridConfig()
    mlp: MLPConfig = MLPConfig(n_neurons=64, n_hidden_layers=1,
                               sphere_init=True, weight_norm=True)


def init_sdf_field(cfg: SDFFieldConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "table": init_table(cfg.grid, k1),
        "mlp": init_mlp(cfg.mlp, cfg.grid.n_output_dims, cfg.feature_dim, k2),
    }


def contract(x: jnp.ndarray, radius: float, kind: str = "aabb") -> jnp.ndarray:
    """Reference contract_to_unisphere (geometry.py:18-30).

    kind='aabb': [-r, r] → [0, 1]; we additionally CLIP to [0, 1] (the
    reference feeds out-of-range values straight into tcnn, which clamps
    internally — the clip here makes that explicit for our own hash encode;
    identical for in-AABB points).
    kind='sphere': nerfacc UN_BOUNDED_SPHERE — inner unit ball → [0.25,
    0.75] band, the outside squashed by 2−1/|x| (always inside [0, 1])."""
    u = (x + radius) / (2 * radius)
    if kind == "sphere":
        y = u * 2 - 1
        # eps under the sqrt keeps the norm's VJP finite at y=0 (a bare
        # jnp.linalg.norm leaks NaN through the untaken where-branch)
        mag = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True) + 1e-24)
        y = jnp.where(mag > 1, (2 - 1 / mag) * (y / mag), y)
        return y / 4 + 0.5
    return jnp.clip(u, 0.0, 1.0)


def sdf_forward(cfg: SDFFieldConfig, params, x: jnp.ndarray,
                level_mask: Optional[jnp.ndarray] = None,
                n_active: Optional[int] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (P, 3) world coords in [-r, r] → (sdf (P,), feature (P, D)).
    Note: like the reference (geometry.py:160), the feature INCLUDES the sdf
    as channel 0. n_active: static active-level count (see hashgrid.encode)."""
    u = contract(x, cfg.radius)
    enc = encode(params["table"], u, cfg.grid, level_mask, n_active)
    # f32 at the field boundary: alpha/eikonal/compositing stay f32 even
    # when the encode/MLP chain runs bf16 (grid.compute_dtype)
    out = apply_mlp(cfg.mlp, params["mlp"], enc).astype(jnp.float32)
    return out[..., 0], out


def sdf_with_grad_analytic(cfg: SDFFieldConfig, params, x: jnp.ndarray,
                           level_mask: Optional[jnp.ndarray] = None,
                           n_active: Optional[int] = None):
    """Analytic position gradients (reference grad_type='analytic',
    geometry.py:153-157) via the MANUAL spatial jacobian of the trilinear
    interpolation + MLP jvps.

    TPU rationale: finite differences re-evaluate the field at 6 probes,
    multiplying the hash-table index traffic ×7 (the dominant TPU cost), and
    nested autodiff (jax.grad inside the loss graph) crashes this TPU
    compiler. encode_with_spatial_grad returns ∂enc/∂x in closed form from
    the SAME gathers; three MLP jvps then give ∂sdf/∂x with the whole
    training graph staying first-order.
    """
    from drawingspinup_tpu.models.hashgrid import encode_with_spatial_grad

    u = contract(x, cfg.radius)
    enc, denc = encode_with_spatial_grad(params["table"], u, cfg.grid,
                                         level_mask, n_active)
    mlp = lambda e: apply_mlp(cfg.mlp, params["mlp"], e)
    feat = mlp(enc)
    sdf = feat[..., 0]
    # chain rule: u = (x + r) / (2r) => d/dx = d/du / (2r)
    scale = 1.0 / (2.0 * cfg.radius)
    grads = []
    for k in range(3):
        _, tang = jax.jvp(mlp, (enc,), (denc[k],))
        grads.append(tang[..., 0].astype(jnp.float32) * scale)
    grad = jnp.stack(grads, axis=-1)                     # (P, 3)
    return sdf.astype(jnp.float32), grad, feat.astype(jnp.float32)


def sdf_with_grad(cfg: SDFFieldConfig, params, x: jnp.ndarray, eps,
                  level_mask: Optional[jnp.ndarray] = None,
                  with_laplace: bool = False,
                  n_active: Optional[int] = None):
    """Finite-difference gradients (reference geometry.py:158-187): the 6
    offset probes and the center run as ONE batched field evaluation."""
    p = x.shape[0]
    offsets = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    probes = jnp.clip(x[:, None, :] + eps * offsets[None], -cfg.radius,
                      cfg.radius)                         # (P, 6, 3)
    all_pts = jnp.concatenate([x, probes.reshape(-1, 3)], axis=0)
    sdf_all, feat_all = sdf_forward(cfg, params, all_pts, level_mask, n_active)
    sdf = sdf_all[:p]
    feature = feat_all[:p]
    d = sdf_all[p:].reshape(p, 6)
    grad = 0.5 * (d[:, 0::2] - d[:, 1::2]) / eps          # (P, 3)
    if with_laplace:
        laplace = (d[:, 0::2] + d[:, 1::2] - 2.0 * sdf[:, None]).sum(-1) \
            / (eps ** 2)
        return sdf, grad, feature, laplace
    return sdf, grad, feature


# ---------------------------------------------------------------------------
# Radiance field (reference texture.py:9-30)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RadianceConfig:
    input_feature_dim: int = 16  # feature 13 ⊕ normal 3 (config add:13,3)
    mlp: MLPConfig = MLPConfig(n_neurons=64, n_hidden_layers=2,
                               output_activation="sigmoid")


def init_radiance(cfg: RadianceConfig, key: jax.Array) -> Dict[str, Any]:
    return {"mlp": init_mlp(cfg.mlp, cfg.input_feature_dim, 3, key)}


def radiance_forward(cfg: RadianceConfig, params, feature: jnp.ndarray,
                     dirs: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """NOTE: like the reference fork (texture.py:21-27), view dirs are
    accepted for API parity but NOT fed to the network — the input is
    feature ⊕ normal only."""
    del dirs
    h = jnp.concatenate([feature, normal], axis=-1)
    return apply_mlp(cfg.mlp, params["mlp"], h)


# ---------------------------------------------------------------------------
# Variance (reference neus.py:12-40)
# ---------------------------------------------------------------------------

def init_variance(init_val: float = 0.3) -> Dict[str, jnp.ndarray]:
    return {"variance": jnp.asarray(init_val, jnp.float32)}


def inv_s(params) -> jnp.ndarray:
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
