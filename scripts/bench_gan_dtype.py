"""Stage-3 GAN compute-dtype A/B on the real chip: f32 vs bf16 activations
(GANConfig.compute_dtype) at the production config (batch 40 × 32²,
GeneratorJ_RIC fused). Alternated-lap step timing + a quality gate: train
both arms on a structured synthetic stylization task and compare in-mask
full-frame reconstruction PSNR of G(pre) vs the style target.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData
from drawingspinup_tpu.train import gan


def make_style_task(size=512, seed=0):
    """Character-ish blob with smooth shading; style target = posterized
    palette + darkened rim — learnable, non-trivial, deterministic."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    mask = np.zeros((size, size), bool)
    for cy, cx, r in [(0.35, 0.5, 0.22), (0.65, 0.45, 0.18),
                      (0.6, 0.62, 0.12)]:
        mask |= np.hypot(yy - cy, xx - cx) < r
    shade = 0.5 + 0.5 * np.sin(6 * xx) * np.cos(5 * yy)
    rgb = np.stack([shade, 0.3 + 0.5 * yy, 0.7 - 0.4 * xx], -1)
    rgb *= mask[..., None]
    dist = np.hypot(yy - 0.5, xx - 0.5)
    rim = ((dist > 0.15) & mask).astype(np.float32)
    post = np.floor(rgb * 4) / 4 * (1 - 0.5 * rim[..., None])
    post = post * mask[..., None]
    pos = np.stack([xx, yy], -1) * mask[..., None]
    pre = np.concatenate([rgb * 2 - 1, mask[..., None].astype(np.float32),
                          pos], -1).astype(np.float32)
    ys, xs = np.nonzero(mask)
    keep = (ys > 16) & (ys < size - 16) & (xs > 16) & (xs < size - 16)
    valid = np.stack([ys[keep], xs[keep]], -1).astype(np.int32)
    valid = valid[rng.permutation(len(valid))[:20000]]
    return KeyframeData(pre=jnp.asarray(pre),
                        post=jnp.asarray(post * 2 - 1, jnp.float32),
                        mask=jnp.asarray(mask, jnp.float32),
                        valid_yx=jnp.asarray(valid)), mask, post


def build_arm(cfg, data):
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    holder = {"state": state}

    def step_fn(key):
        st, logs = gan.train_step(cfg, holder["state"], data, key)
        holder["state"] = st
        return float(logs["g_loss"])

    return step_fn, holder


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    data, mask, post = make_style_task()
    base = gan.GANConfig()
    arms = {}
    for cdt in ("float32", "bfloat16"):
        cfg = dataclasses.replace(base, compute_dtype=cdt)
        arms[cdt] = (cfg,) + build_arm(cfg, data)

    key = jax.random.PRNGKey(1)
    for name, (cfg, fn, holder) in arms.items():
        t0 = time.time()
        fn(jax.random.fold_in(key, hash(name) % 1000))
        print(f"[compile+load] {name}: {time.time() - t0:.0f}s", flush=True)

    laps, n_inner = 5, 20
    results = {k: [] for k in arms}
    for lap in range(laps):
        for name, (cfg, fn, holder) in arms.items():
            fn(jax.random.fold_in(key, 5000 + lap))
            t0 = time.time()
            for i in range(n_inner):
                fn(jax.random.fold_in(key, lap * 1000 + i))
            results[name].append((time.time() - t0) / n_inner * 1000)
        print("lap %d: " % lap + "  ".join(
            f"{k}={v[-1]:.1f}" for k, v in results.items()), flush=True)
    for name, vals in results.items():
        print(f"step median {name:10s} {float(np.median(vals)):6.1f} ms",
              flush=True)

    # quality gate: continue training to `steps` total, then full-frame PSNR
    for name, (cfg, fn, holder) in arms.items():
        t0 = time.time()
        done = 1 + laps * (n_inner + 1)
        for i in range(steps - done):
            fn(jax.random.fold_in(key, 10000 + i))
        out = gan.generate_full(cfg, holder["state"], np.asarray(data.pre))
        tgt = (np.asarray(data.post) + 1) * 0.5
        m = mask
        mse = float(np.mean((out[m] - tgt[m]) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"[{name}] {steps} steps total in +{time.time() - t0:.0f}s, "
              f"in-mask PSNR vs style target: {psnr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
