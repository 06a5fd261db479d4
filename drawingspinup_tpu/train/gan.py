"""Patch-GAN trainer for the style translator — jitted D/G steps.

Parity with the reference loop (``3_style_translator/training/trainers.py``):
  D step: MSE(D(masked fake), 0) + MSE(D(masked random-GT patch), 1)
  G step: recon_w·L1(G(pre), post) + perc_w·L2(VGG(G(pre)) − VGG(post))
          + adv_w·MSE(D(masked fake), 1)
  Adam lr 4e-4 betas (0.9, 0.999) weight_decay 1e-5; batch 40 × 32² patches;
  full-image eval + checkpoint every ``log_interval`` batches.

One jitted ``train_step`` performs patch sampling (on-device), the D update
and the G update; epochs follow the reference's notion of
``n_valid_pixels / batch_size`` batches per epoch.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drawingspinup_tpu.models.generator_j import (
    DiscriminatorN_IN, GeneratorJ, GeneratorJ_RIC, PerceptualVGG19,
)
from drawingspinup_tpu.pipelines.stage3_data import KeyframeData, sample_patches


@dataclasses.dataclass(frozen=True)
class GANConfig:
    generator: str = "GeneratorJ_RIC"      # GeneratorJ | GeneratorJ_RIC
    filters: Tuple[int, ...] = (32, 64, 128, 128, 128, 64)
    resnet_blocks: int = 7
    tanh: bool = True
    append_smoothers: bool = True
    input_channels: int = 6                # 3 rgb + 1 mask + 2 pos
    disc_filters: int = 12
    disc_layers: int = 2
    lr: float = 4e-4
    weight_decay: float = 1e-5
    batch_size: int = 40
    patch_size: int = 32
    reconstruction_weight: float = 4.0
    perception_weight: float = 6.0
    adversarial_weight: float = 0.5
    log_interval: int = 1000
    # mid-training progress evals render only this many frames per action
    # (the reference renders ALL frames every 1000 batches purely for
    # eyeballing, trainers.py:183-190 — ~11 s/eval at 64 frames); the final
    # eval, whose outputs feed the next stage and the GIF, is always
    # unlimited. None = reference behavior (every frame, every eval).
    eval_frame_limit: Optional[int] = 8
    epochs: int = 3
    use_image_loss: bool = True
    # path to a VGG19-features npz (scripts/export_vgg19_npz.py); None →
    # $DSU_VGG19_NPZ → loud random-feature fallback
    vgg_npz: Optional[str] = None
    # activation compute dtype for G/D/VGG (params + norm stats + losses
    # stay f32): bfloat16 halves the HBM traffic of the (N,H,W,9,O) RIC
    # intermediates that bind the train step. A/B'd before adoption
    # (scripts/bench_gan_dtype.py, PERF_NOTES.md).
    compute_dtype: str = "float32"
    # RICConv op schedule for TRAINING: "pallas" (kernels/ric_conv.py,
    # VMEM-resident) | "fused" (XLA). Adopted after the on-chip A/B
    # (scripts/bench_ric_pallas.py, 2026-08-18): full train step 8.35 ms
    # pallas vs 12.06 ms fused (−31%), forward 9.62 vs 13.00 ms; exact-math
    # parity in tests/test_ric_pallas.py. Round-4 kernel tuning (plane-skip
    # + 4× row blocks, scripts/bench_ric_layers.py) took the dependent-chain
    # production step 12.35 → 7.17 ms. Inference always uses "pershift"
    # (full 512² frames exceed the kernel's VMEM-resident row budget).
    ric_variant: str = "pallas"


class GANState(NamedTuple):
    g_params: Any
    g_stats: Any
    d_params: Any
    vgg_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def build_models(cfg: GANConfig, ric_variant: Optional[str] = None):
    """ric_variant: RICConv formulation (same params, same math, different
    op schedule). "fused" is ~2× faster to TRAIN (one write+read of the
    (N,H,W,9,O) intermediates per direction); "pershift" is ~27% faster for
    full-frame INFERENCE (no second materialized intermediate). Measured on
    v5e: train step 38→19 ms fused; 512² frame 72.5 ms pershift vs 99.6
    fused. See PERF_NOTES.md."""
    gen_cls = {"GeneratorJ": GeneratorJ, "GeneratorJ_RIC": GeneratorJ_RIC}[
        cfg.generator]
    if ric_variant is None:
        ric_variant = cfg.ric_variant
    kw = {"ric_variant": ric_variant} if cfg.generator == "GeneratorJ_RIC" \
        else {}
    dt = jnp.dtype(cfg.compute_dtype)
    gen = gen_cls(filters=cfg.filters, resnet_blocks=cfg.resnet_blocks,
                  tanh=cfg.tanh, append_smoothers=cfg.append_smoothers,
                  dtype=dt, **kw)
    disc = DiscriminatorN_IN(num_filters=cfg.disc_filters,
                             n_layers=cfg.disc_layers, dtype=dt)
    vgg = PerceptualVGG19(dtype=dt)
    return gen, disc, vgg


def resolve_vgg_npz(cfg: GANConfig):
    """Locate real VGG19 feature weights (cfg.vgg_npz → $DSU_VGG19_NPZ), or
    report a fail-class degradation: the reference never trains without
    frozen ImageNet VGG19 features (3_style_translator/training/
    models.py:480-548), so without them the perceptual-loss landscape
    changes. In strict mode (production CLIs — core/weights_policy.py)
    missing weights RAISE unless --allow-degraded-weights; otherwise the
    fixed-random-feature fallback is warned once and recorded."""
    npz = cfg.vgg_npz or os.environ.get("DSU_VGG19_NPZ")
    if npz and os.path.exists(npz):
        return npz
    from drawingspinup_tpu.core import weights_policy
    weights_policy.report_degraded(
        "gan-vgg19",
        "perceptual loss running with FIXED RANDOM VGG features (no VGG19 "
        "weights found — set DSU_VGG19_NPZ or GANConfig.vgg_npz to an npz "
        "from scripts/export_vgg19_npz.py to match the reference's "
        "ImageNet-VGG perceptual loss)", fail=True)
    return None


def make_optimizers(cfg: GANConfig):
    tx = optax.adamw(cfg.lr, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay)
    return tx, tx


def init_state(cfg: GANConfig, key: jax.Array) -> GANState:
    gen, disc, vgg = build_models(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    p = cfg.patch_size
    x = jnp.zeros((1, p, p, cfg.input_channels), jnp.float32)
    # jitted inits (eager flax init dispatches op-by-op through the device
    # tunnel — seconds of per-uid overhead across a 120-uid sweep)
    g_vars = jax.jit(partial(gen.init, train=True))(k1, x)
    d_vars = jax.jit(disc.init)(k2, jnp.zeros((1, p, p, 3), jnp.float32))
    # fixed-seed VGG init → deterministic random-feature perceptual metric
    vgg_vars = jax.jit(vgg.init)(jax.random.PRNGKey(12345),
                                 jnp.zeros((1, p, p, 3), jnp.float32))
    # Real VGG19 weights: overlay from an npz (scripts/export_vgg19_npz.py
    # converts a torchvision state_dict) given via cfg.vgg_npz or
    # $DSU_VGG19_NPZ. The reference trains against frozen ImageNet VGG19
    # features (3_style_translator/training/models.py:480-548); without
    # them the perceptual loss uses fixed RANDOM features, which measurably
    # changes stylization — so the fallback is LOUD, not silent.
    npz = resolve_vgg_npz(cfg)
    if npz:
        from drawingspinup_tpu.models.generator_j import load_vgg_weights_npz
        vgg_vars = load_vgg_weights_npz(dict(vgg_vars), npz)
        print(f"[gan] perceptual loss: real VGG19 weights from {npz}")
    g_tx, d_tx = make_optimizers(cfg)
    return GANState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        d_params=d_vars["params"], vgg_params=vgg_vars["params"],
        g_opt=g_tx.init(g_vars["params"]), d_opt=d_tx.init(d_vars["params"]),
        step=jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def train_step(cfg: GANConfig, state: GANState, data: KeyframeData,
               key: jax.Array) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
    gen, disc, vgg = build_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    k_patch, _ = jax.random.split(key)
    batch = sample_patches(data, k_patch, cfg.batch_size, cfg.patch_size)

    # ---- generator forward, ONCE ----
    # The reference computes `generated` once and reuses the tensor for the
    # D step (detached) and the G loss (trainers.py D-then-G ordering with
    # the graph retained). jax.vjp reproduces that exactly: the same primal
    # output feeds the D step as a constant, and the G gradient pulls the
    # tail cotangent back through the saved residuals — identical math to
    # the earlier two-forward formulation (both applies used state.g_stats,
    # so the outputs were already bit-identical), one G forward cheaper.
    def g_fwd(g_params):
        out, mut = gen.apply({"params": g_params,
                              "batch_stats": state.g_stats}, batch["pre"],
                             train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    fake, g_vjp, g_stats = jax.vjp(g_fwd, state.g_params, has_aux=True)

    # ---- discriminator step (fake is a constant here) ----
    def d_loss_fn(d_params):
        fake_m = fake * batch["pre_mask"]
        true_m = batch["already"] * batch["already_mask"]
        fl, _ = disc.apply({"params": d_params}, fake_m)
        tl, _ = disc.apply({"params": d_params}, true_m)
        return jnp.mean(fl ** 2) + jnp.mean((tl - 1.0) ** 2)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    # ---- generator step: loss tail on the saved forward, then pull back ----
    def g_tail(out):
        image_loss = jnp.mean(jnp.abs(out - batch["post"])) \
            if cfg.use_image_loss else 0.0
        # per-map squared sums ≡ mean over the concatenated feature vector,
        # without the flatten/concat relayouts (≈20 ms/step on TPU)
        f_fake = vgg.apply({"params": state.vgg_params}, out, as_list=True)
        f_real = vgg.apply({"params": state.vgg_params}, batch["post"],
                           as_list=True)
        sq = sum(jnp.sum((a - b) ** 2) for a, b in zip(f_fake, f_real))
        numel = sum(np.prod(a.shape) for a in f_fake)
        perception_loss = sq / numel
        fl, _ = disc.apply({"params": d_params}, out * batch["pre_mask"])
        adversarial_loss = jnp.mean((fl - 1.0) ** 2)
        total = (cfg.reconstruction_weight * image_loss
                 + cfg.perception_weight * perception_loss
                 + cfg.adversarial_weight * adversarial_loss)
        return total, (image_loss, perception_loss, adversarial_loss)

    (g_loss, (img_l, perc_l, adv_l)), out_grad = \
        jax.value_and_grad(g_tail, has_aux=True)(fake)
    (g_grads,) = g_vjp(out_grad)
    g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)

    new_state = GANState(g_params, g_stats, d_params, state.vgg_params,
                         g_opt, d_opt, state.step + 1)
    logs = {"d_loss": d_loss, "g_loss": g_loss, "image_loss": img_l,
            "perception_loss": perc_l, "adversarial_loss": adv_l}
    return new_state, logs


@functools.lru_cache(maxsize=8)
def _full_frame_runner(cfg: GANConfig):
    # "pershift" RIC variant: inference-optimal (see build_models docstring)
    gen, _, _ = build_models(cfg, ric_variant="pershift")

    @jax.jit
    def _run(params, stats, x):
        return gen.apply({"params": params, "batch_stats": stats}, x,
                         train=False)

    return _run


@functools.lru_cache(maxsize=8)
def _full_frame_runner_u8(cfg: GANConfig, use_mask: bool, use_pos: bool,
                          use_edge: bool):
    """Full-frame eval with u8 tunnel transfers: takes the (H, W, 7) uint8
    source stack (stage3_data.load_full_frame_u8), assembles the features
    IN-GRAPH (identical math to load_full_frame: u8/255 grid values, edge
    test u8<255 ≡ f32<1.0), and returns the final u8 RGBA — H2D moves
    7 B/px instead of 24, D2H 4 B/px instead of 12. On the tunneled v5e
    the f32 transfers were 3.4× the 71.5 ms compute (PERF_NOTES r3)."""
    gen, _, _ = build_models(cfg, ric_variant="pershift")

    @jax.jit
    def _run(params, stats, x_u8):
        f = x_u8.astype(jnp.float32) / 255.0
        rgb, alpha = f[..., 0:3], f[..., 3]
        if use_edge:
            em = x_u8[..., 4] < 255
            rgb = jnp.where(em[..., None], 0.0, rgb)
        feats = [rgb * 2.0 - 1.0]
        if use_mask:
            feats.append(alpha[..., None])     # PRE-overlay alpha == mask
        if use_pos:
            feats.append(f[..., 5:7] * 2.0 - 1.0)
        x = jnp.concatenate(feats, axis=-1)
        out = gen.apply({"params": params, "batch_stats": stats}, x[None],
                        train=False)[0]
        # same math as finalize_full + write_image's f32→u8 quantization
        rgb8 = (jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)
                * 255.0 + 0.5).astype(jnp.uint8)
        a8 = (alpha * 255.0 + 0.5).astype(jnp.uint8)
        return jnp.concatenate([rgb8, a8[..., None]], axis=-1)

    return _run


def generate_full_rgba_async(cfg: GANConfig, state: GANState,
                             x_u8: np.ndarray, use_mask: bool,
                             use_pos: bool, use_edge: bool) -> jnp.ndarray:
    """Dispatch a u8-in/u8-out full-frame stylization without syncing;
    np.asarray(result) yields the writable (H, W, 4) uint8 RGBA."""
    run = _full_frame_runner_u8(cfg, use_mask, use_pos, use_edge)
    return run(state.g_params, state.g_stats, jnp.asarray(x_u8))


def generate_full(cfg: GANConfig, state: GANState,
                  frame: np.ndarray) -> np.ndarray:
    """Run the generator on a full frame (eval mode, running BN stats).
    frame: (H, W, C_in) normalized → (H, W, 3) in [0,1]."""
    return finalize_full(generate_full_async(cfg, state, frame))


def generate_full_async(cfg: GANConfig, state: GANState,
                        frame: np.ndarray) -> jnp.ndarray:
    """Dispatch a full-frame generation WITHOUT syncing — callers that
    stylize many frames overlap device compute / tunnel D2H with host PNG
    IO by keeping a small pending queue (pipelines/stage3_translate.py)."""
    _run = _full_frame_runner(cfg)
    return _run(state.g_params, state.g_stats, jnp.asarray(frame)[None])


def finalize_full(out: jnp.ndarray) -> np.ndarray:
    return np.asarray((out[0] + 1.0) * 0.5).clip(0, 1)


def save_checkpoint(log_dir: str, state: GANState, step: int) -> None:
    from drawingspinup_tpu.core import checkpoint as ckpt
    ckpt.save(os.path.join(log_dir, f"model_{step:05d}"),
              {"g_params": state.g_params, "g_stats": state.g_stats})


def load_checkpoint(log_dir: str, state: GANState,
                    step: Optional[int] = None) -> GANState:
    from drawingspinup_tpu.core import checkpoint as ckpt
    if step is None:
        step = ckpt.latest_step(log_dir, prefix="model_")
        assert step is not None, f"no checkpoints under {log_dir}"
    tree = ckpt.restore(os.path.join(log_dir, f"model_{step:05d}"),
                        {"g_params": state.g_params, "g_stats": state.g_stats})
    return state._replace(g_params=tree["g_params"], g_stats=tree["g_stats"])
