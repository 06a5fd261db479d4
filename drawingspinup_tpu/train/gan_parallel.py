"""Multi-chip stage-3 GAN training — patch batch data-parallel over the mesh.

The reference trains its per-character style GANs on one GPU
(``3_style_translator/training/trainers.py:140-192``). Here the 40-patch
batch (config_stage*.yaml trainer.batch_size) shards over the ``dp`` axis:
each device samples and renders its own patch shard with its own RNG,
gradients (and BatchNorm batch stats) are ``pmean``-reduced over ICI, and
the replicated optimizer updates are applied identically on every device.
The D→G ordering matches train/gan.py exactly: the generator's adversarial
term sees the ALREADY-UPDATED discriminator.

``production_train_step`` is the entry ``pipelines/stage3_translate``
uses whenever ``len(jax.devices()) > 1``; ``__graft_entry__``'s dryrun
exercises the same function.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData, sample_patches
from drawingspinup_tpu.train import gan


def make_train_step_dp(cfg: gan.GANConfig, mesh: Mesh):
    """Build a jitted dp train step(state, data, key) for the given mesh."""
    ndp = mesh.shape["dp"]
    # ceil so the effective patch batch is never silently BELOW the
    # reference's fixed 40 (cfg 40 on 16 devices → 3/dev = 48, not 32)
    per_dev = max(-(-cfg.batch_size // ndp), 1)
    if per_dev * ndp != cfg.batch_size:
        print(f"[gan dp] batch_size {cfg.batch_size} not divisible by "
              f"dp={ndp}: using {per_dev}/device ({per_dev * ndp} total)")
    gen, disc, vgg = gan.build_models(cfg)
    g_tx, d_tx = gan.make_optimizers(cfg)

    def device_step(state: gan.GANState, data: KeyframeData, key: jax.Array):
        batch = sample_patches(data, key, per_dev, cfg.patch_size)

        # single generator forward per step via jax.vjp, matching
        # train/gan.py: the primal output feeds the D step as a constant,
        # the G gradient pulls the tail cotangent back through the residuals
        def g_fwd(g_params):
            out, mut = gen.apply({"params": g_params,
                                  "batch_stats": state.g_stats},
                                 batch["pre"], train=True,
                                 mutable=["batch_stats"])
            return out, mut["batch_stats"]

        fake, g_vjp, g_stats = jax.vjp(g_fwd, state.g_params, has_aux=True)

        def d_loss_fn(d_params):
            fl, _ = disc.apply({"params": d_params},
                               fake * batch["pre_mask"])
            tl, _ = disc.apply({"params": d_params},
                               batch["already"] * batch["already_mask"])
            return jnp.mean(fl ** 2) + jnp.mean((tl - 1.0) ** 2)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_grads = jax.lax.pmean(d_grads, "dp")
        # replicated update (identical on every device after pmean)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_tail(out):
            image_loss = jnp.mean(jnp.abs(out - batch["post"])) \
                if cfg.use_image_loss else 0.0
            f_fake = vgg.apply({"params": state.vgg_params}, out,
                               as_list=True)
            f_real = vgg.apply({"params": state.vgg_params}, batch["post"],
                               as_list=True)
            sq = sum(jnp.sum((a - b) ** 2) for a, b in zip(f_fake, f_real))
            numel = sum(np.prod(a.shape) for a in f_fake)
            perception_loss = sq / numel
            fl, _ = disc.apply({"params": d_params},
                               out * batch["pre_mask"])
            adversarial_loss = jnp.mean((fl - 1.0) ** 2)
            total = (cfg.reconstruction_weight * image_loss
                     + cfg.perception_weight * perception_loss
                     + cfg.adversarial_weight * adversarial_loss)
            return total, (image_loss, perception_loss, adversarial_loss)

        (g_loss, (img_l, perc_l, adv_l)), out_grad = \
            jax.value_and_grad(g_tail, has_aux=True)(fake)
        (g_grads,) = g_vjp(out_grad)
        g_grads = jax.lax.pmean(g_grads, "dp")
        g_stats = jax.lax.pmean(g_stats, "dp")
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        logs = jax.lax.pmean(
            {"d_loss": d_loss, "g_loss": g_loss, "image_loss": img_l,
             "perception_loss": perc_l, "adversarial_loss": adv_l}, "dp")
        new_state = gan.GANState(g_params, g_stats, d_params,
                                 state.vgg_params, g_opt, d_opt,
                                 state.step + 1)
        return new_state, logs

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P("dp")),
             out_specs=(P(), P()), check_vma=False)
    def sharded(state, data, keys):
        return device_step(state, data, keys[0])

    @jax.jit
    def train_step(state: gan.GANState, data: KeyframeData, key: jax.Array
                   ) -> Tuple[gan.GANState, Dict[str, jnp.ndarray]]:
        keys = jax.random.split(key, ndp)
        return sharded(state, data, keys)

    return train_step


_PROD_CACHE: Dict = {}


def production_train_step(cfg: gan.GANConfig, mesh: Mesh = None):
    """Cached production entry — used by stage3_translate.train_stage when
    more than one device is visible, and exercised by dryrun_multichip."""
    if mesh is None:
        from drawingspinup_tpu.parallel.mesh import make_mesh
        ndev = len(jax.devices())
        mesh = make_mesh(ndev, dp=ndev)
    key = (cfg, tuple(d.id for d in mesh.devices.flat))
    if key not in _PROD_CACHE:
        _PROD_CACHE[key] = make_train_step_dp(cfg, mesh)
    return _PROD_CACHE[key]
