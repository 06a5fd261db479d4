"""Stage-3 budget attack (VERDICT r3 next #6): larger patch batches at an
EQUAL total-patch budget vs the reference schedule, on the real chip, with
the same synthetic-stylization quality gate as bench_gan_dtype.py.

The reference trains batch 40 × 32² for (3+2 epochs · n_valid/40) steps
(config_stage1.yaml:50-59). The per-step cost here is backward/overhead
bound, not FLOP-bound, so B·k patches in k× fewer steps may finish the same
patch budget faster — IF quality holds with k× fewer optimizer updates.
Arms: (batch, lr-scale) at fixed patch budget; prints wall seconds and
in-mask full-frame PSNR of G(pre) vs the style target.
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
import numpy as np

from bench_gan_dtype import make_style_task
from drawingspinup_tpu.train import gan


def run_arm(batch: int, lr_scale: float, budget_patches: int, data, mask,
            post) -> dict:
    cfg = dataclasses.replace(gan.GANConfig(), batch_size=batch,
                              lr=4e-4 * lr_scale)
    steps = budget_patches // batch
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    # compile + warm
    state, logs = gan.train_step(cfg, state, data, key)
    float(logs["g_loss"])
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, logs = gan.train_step(cfg, state, data, k)
    g = float(logs["g_loss"])     # D2H sync
    wall = time.time() - t0

    # same gate as bench_gan_dtype.py (26 dB-class on this task at the
    # reference schedule)
    out = gan.generate_full(cfg, state, np.asarray(data.pre))
    tgt = (np.asarray(data.post) + 1) * 0.5
    m = mask
    mse = float(np.mean((out[m] - tgt[m]) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    return {"batch": batch, "lr_scale": lr_scale, "steps": steps,
            "wall_s": round(wall, 1), "psnr": round(psnr, 2),
            "final_g": round(g, 4)}


def main():
    data, mask, post = make_style_task()
    budget = 3000 * 40           # the gate's reference-equivalent budget
    arms = [(40, 1.0), (80, 1.0), (80, 1.414), (160, 1.0), (160, 2.0),
            (320, 2.0)]
    results = []
    for batch, lrs in arms:
        r = run_arm(batch, lrs, budget, data, mask, post)
        results.append(r)
        print(r, flush=True)
    print("\nbaseline PSNR:", results[0]["psnr"])
    for r in results[1:]:
        print(f"batch {r['batch']} lr×{r['lr_scale']}: "
              f"{r['wall_s']}s ({results[0]['wall_s'] / r['wall_s']:.2f}×) "
              f"PSNR {r['psnr']} (Δ{r['psnr'] - results[0]['psnr']:+.2f})")


if __name__ == "__main__":
    main()
