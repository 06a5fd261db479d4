"""Benchmark stage-3 style-translator training on the real TPU: patch-GAN
train steps/s at the production config (batch 40 x 32x32 patches, RIC
generator), plus the resulting full reference budget (3 epochs stage-1 +
2 epochs stage-2) in minutes.

Sync discipline per PERF_NOTES.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.train import gan


def main():
    from drawingspinup_tpu.pipelines.stage3_data import KeyframeData

    size = 512
    rng = np.random.default_rng(0)
    pre = rng.random((size, size, 6), np.float32)   # color+mask+pos xy
    post = rng.random((size, size, 3), np.float32)
    mask = np.zeros((size, size), np.float32)
    mask[64:448, 64:448] = 1.0
    ys, xs = np.nonzero(mask)
    data = KeyframeData(
        pre=jnp.asarray(pre), post=jnp.asarray(post),
        mask=jnp.asarray(mask),
        valid_yx=jnp.asarray(np.stack([ys, xs], 1).astype(np.int32)))

    cfg = gan.GANConfig()  # production: GeneratorJ_RIC, 6 input channels
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    n_valid = int(mask.sum())
    # epoch = one pass over the valid midpoints (reference DatasetPatches_M:
    # one 32x32 patch per valid pixel, batch 40)
    batches_per_epoch = max(n_valid // cfg.batch_size, 1)

    t0 = time.time()
    for _ in range(3):
        key, k = jax.random.split(key)
        state, logs = gan.train_step(cfg, state, data, k)
    print(f"warmup incl. compile: {time.time() - t0:.1f}s "
          f"g_loss={float(logs['g_loss']):.3f}")

    n = 30
    t0 = time.time()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, logs = gan.train_step(cfg, state, data, k)
    _ = float(logs["g_loss"])  # D2H sync
    dt = time.time() - t0
    sps = n / dt
    total_batches = batches_per_epoch * (3 + 2)  # stage1 + stage2 budgets
    print(f"{n} GAN steps in {dt:.2f}s -> {sps:.2f} steps/s "
          f"({1000 * dt / n:.0f} ms/step)")
    print(f"epoch = {batches_per_epoch} batches; reference budget "
          f"(3+2 epochs) ≈ {total_batches / sps / 60:.1f} min")


if __name__ == "__main__":
    main()
