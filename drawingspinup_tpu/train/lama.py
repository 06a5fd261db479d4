"""Stage-1 contour-segmentation trainer (LaMa-style) — jitted steps.

The reference repo ships only the trained checkpoint
(``epoch=3-step=3599_generator.ckpt``) plus the training datasets and the
FFC discriminator — the trainer itself lived in the upstream LaMa project.
This module closes that gap: supervised BCE + dice on the contour
probability, with optional adversarial + feature-matching terms against
FFCNLayerDiscriminator (the reference's training-time module,
ffc.py:369-432). Data-parallel ready: the batch axis shards over the dp
mesh axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drawingspinup_tpu.models.ffc import FFCNLayerDiscriminator, FFCResNetGenerator


@dataclasses.dataclass(frozen=True)
class LamaTrainConfig:
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    resnet_ratio: float = 0.75
    lr: float = 1e-3
    disc_lr: float = 1e-4
    batch_size: int = 8
    adversarial_weight: float = 0.0  # 0 = pure supervised
    feature_matching_weight: float = 10.0
    dice_weight: float = 1.0
    steps: int = 3600


class LamaState(NamedTuple):
    g_params: Any
    g_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def build_models(cfg: LamaTrainConfig):
    gen = FFCResNetGenerator(output_nc=1, ngf=cfg.ngf,
                             n_downsampling=cfg.n_downsampling,
                             n_blocks=cfg.n_blocks,
                             resnet_ratio=cfg.resnet_ratio,
                             enable_lfu=False, add_out_act="sigmoid")
    disc = FFCNLayerDiscriminator(ndf=max(cfg.ngf // 2, 8))
    return gen, disc


def init_state(cfg: LamaTrainConfig, key: jax.Array,
               size: int = 512) -> LamaState:
    gen, disc = build_models(cfg)
    k1, k2 = jax.random.split(key)
    # jitted inits at a small spatial size (both nets are fully
    # convolutional — param shapes don't depend on H/W; eager init at 512²
    # runs op-by-op through the device tunnel for minutes, and jitting the
    # full-res init graph compiles even longer)
    init_hw = min(size, 64)
    x = jnp.zeros((1, init_hw, init_hw, 4), jnp.float32)
    g_vars = jax.jit(partial(gen.init, train=True))(k1, x)
    d_vars = jax.jit(disc.init)(
        k2, jnp.zeros((1, init_hw, init_hw, 1), jnp.float32))
    g_tx, d_tx = optax.adam(cfg.lr), optax.adam(cfg.disc_lr)
    return LamaState(g_vars["params"], g_vars.get("batch_stats", {}),
                     d_vars["params"], g_tx.init(g_vars["params"]),
                     d_tx.init(d_vars["params"]), jnp.asarray(0, jnp.int32))


def _dice(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    inter = jnp.sum(pred * gt)
    return 1.0 - (2 * inter + eps) / (jnp.sum(pred) + jnp.sum(gt) + eps)


@partial(jax.jit, static_argnames=("cfg",))
def train_step(cfg: LamaTrainConfig, state: LamaState,
               batch: Dict[str, jnp.ndarray], key: jax.Array
               ) -> Tuple[LamaState, Dict[str, jnp.ndarray]]:
    gen, disc = build_models(cfg)
    g_tx, d_tx = optax.adam(cfg.lr), optax.adam(cfg.disc_lr)
    x = batch["input"]
    gt = batch["gt"][..., None] if batch["gt"].ndim == 3 else batch["gt"]

    d_params = state.d_params
    d_opt = state.d_opt
    if cfg.adversarial_weight > 0:
        pred, _ = gen.apply({"params": state.g_params,
                             "batch_stats": state.g_stats}, x, train=True,
                            mutable=["batch_stats"])
        pred = jax.lax.stop_gradient(pred)

        def d_loss_fn(dp):
            fs, _ = disc.apply({"params": dp}, pred)
            rs, _ = disc.apply({"params": dp}, gt)
            return jnp.mean(jax.nn.softplus(fs)) \
                + jnp.mean(jax.nn.softplus(-rs))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        upd, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, upd)
    else:
        d_loss = jnp.asarray(0.0)

    def g_loss_fn(gp):
        pred, mut = gen.apply({"params": gp, "batch_stats": state.g_stats},
                              x, train=True, mutable=["batch_stats"])
        p = jnp.clip(pred, 1e-6, 1 - 1e-6)
        bce = -jnp.mean(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
        dice = _dice(pred, gt)
        total = bce + cfg.dice_weight * dice
        if cfg.adversarial_weight > 0:
            fs, ffeats = disc.apply({"params": d_params}, pred)
            _, rfeats = disc.apply({"params": d_params},
                                   jax.lax.stop_gradient(gt))
            adv = jnp.mean(jax.nn.softplus(-fs))
            fm = sum(jnp.mean(jnp.abs(a - b))
                     for a, b in zip(ffeats, rfeats)) / len(ffeats)
            total = total + cfg.adversarial_weight * adv \
                + cfg.feature_matching_weight * fm
        return total, (mut["batch_stats"], bce, dice)

    (g_loss, (g_stats, bce, dice)), grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(state.g_params)
    upd, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, upd)
    new = LamaState(g_params, g_stats, d_params, g_opt, d_opt, state.step + 1)
    return new, {"g_loss": g_loss, "d_loss": d_loss, "bce": bce,
                 "dice": dice}
