"""A/B the stage-1 trainer on the two contour-synthesis variants
(VERDICT r1 #9): hard uniform bands (round-1 contour_band) vs the
Freestyle-like strokes (freestyle_contour: width wobble, soft alpha,
sketchy gaps). Both models validate on a held-out FREESTYLE set — the
distribution closer to the reference's Blender Freestyle training data
(blenderProc_ortho.py:159-185) and to hand-drawn contours.

Run: python scripts/ab_contour_variants.py  (CPU-safe, ~2 min)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"   # ambient env pins axon; force CPU
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from drawingspinup_tpu.pipelines.stage1_data import (
    contour_band, freestyle_contour, synth_training_pair)
from drawingspinup_tpu.train import lama

SIZE = 64


def random_blob(rng, size=SIZE):
    g = rng.random((6, 6))
    from PIL import Image
    up = np.asarray(Image.fromarray((g * 255).astype(np.uint8))
                    .resize((size, size), Image.BICUBIC), np.float32) / 255.0
    m = (up > np.quantile(up, 0.55)).astype(np.float32)
    lab, n = ndimage.label(m)
    if n > 1:  # keep largest component
        sizes = ndimage.sum(m, lab, range(1, n + 1))
        m = (lab == (1 + int(np.argmax(sizes)))).astype(np.float32)
    return m


def make_pair(rng, variant):
    m = random_blob(rng)
    rgba = np.zeros((SIZE, SIZE, 4), np.float32)
    rgba[..., :3] = rng.random(3)[None, None, :] * m[..., None]
    rgba[..., 3] = m
    t = int(rng.integers(0, 6) * 1 + 1 + rng.integers(0, 3))  # 1..8 px at 64²
    if variant == "hard":
        c = contour_band(m, t)
    else:
        c = freestyle_contour(m, t, rng)
    return synth_training_pair(rgba, c, rng)


def batches(rng, variant, n_steps, bs=8):
    for _ in range(n_steps):
        xs, ys = zip(*[make_pair(rng, variant) for _ in range(bs)])
        yield {"input": jnp.asarray(np.stack(xs)),
               "gt": jnp.asarray(np.stack(ys))}


def run(train_variant, steps=150, seed=0):
    cfg = lama.LamaTrainConfig(ngf=8, n_downsampling=2, n_blocks=2,
                               batch_size=8)
    state = lama.init_state(cfg, jax.random.PRNGKey(seed), size=SIZE)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    for batch in batches(rng, train_variant, steps):
        key, k = jax.random.split(key)
        state, logs = lama.train_step(cfg, state, batch, k)
    # validate on held-out freestyle pairs
    vrng = np.random.default_rng(999)
    bces, dices = [], []
    for batch in batches(vrng, "freestyle", 20):
        pred = lama.predict(cfg, state, batch["input"]) \
            if hasattr(lama, "predict") else None
        if pred is None:
            from drawingspinup_tpu.train.lama import build_models
            gen, _ = build_models(cfg)
            pred = gen.apply({"params": state.g_params,
                              "batch_stats": state.g_stats},
                             batch["input"], train=False)
        p = jnp.clip(pred[..., 0], 1e-4, 1 - 1e-4)
        gt = batch["gt"]
        bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p)).mean()
        hard = (p > 0.2).astype(jnp.float32)
        dice = (2 * (hard * gt).sum() + 1) / (hard.sum() + gt.sum() + 1)
        bces.append(float(bce)); dices.append(float(dice))
    return float(np.mean(bces)), float(np.mean(dices))


for variant in ("hard", "freestyle"):
    bce, dice = run(variant)
    print(f"train={variant:10s} → held-out freestyle val: "
          f"bce={bce:.4f} dice={dice:.4f}")
