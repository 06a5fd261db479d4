"""Stage-3 GAN train step time vs patch batch size, on the real chip.

profile_gan_step.py shows the production step (batch 40 x 32^2 patches,
~1-2 GFLOP) is kernel-overhead bound, not compute bound — the v5e could
chew this batch in tens of microseconds. If step time grows sublinearly
with batch, training the SAME number of patches (the reference's
epoch budget: one 32^2 patch per valid pixel per epoch,
3_style_translator/configs/config_stage1.yaml) in fewer, fatter steps is
a straight win. Prints ms/step and the projected 3+2-epoch budget for
each batch size at equal total-patch throughput.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData
from drawingspinup_tpu.train import gan


def make_data(size=512):
    rng = np.random.default_rng(0)
    mask = np.zeros((size, size), np.float32)
    mask[64:448, 64:448] = 1.0
    ys, xs = np.nonzero(mask)
    return KeyframeData(
        pre=jnp.asarray(rng.random((size, size, 6)), jnp.float32),
        post=jnp.asarray(rng.random((size, size, 3)), jnp.float32),
        mask=jnp.asarray(mask),
        valid_yx=jnp.asarray(np.stack([ys, xs], 1).astype(np.int32)))


def main():
    data = make_data()
    n_valid = int(np.asarray(data.mask).sum())
    base_cfg = gan.GANConfig()
    key = jax.random.PRNGKey(1)

    batches = [40, 80, 160, 320, 640, 1280]
    states, cfgs = {}, {}
    for b in batches:
        cfgs[b] = dataclasses.replace(base_cfg, batch_size=b)
        states[b] = gan.init_state(cfgs[b], jax.random.PRNGKey(0))

    def run(b, n):
        s, k = states[b], key
        for _ in range(n):
            k, kk = jax.random.split(k)
            s, logs = gan.train_step(cfgs[b], s, data, kk)
        return float(logs["g_loss"])

    for b in batches:
        t0 = time.time()
        run(b, 2)
        print(f"warm batch={b}: {time.time() - t0:.1f}s", flush=True)

    times = {b: [] for b in batches}
    for lap in range(6):
        for b in batches:
            n = max(30 * 40 // b, 4)   # equal patch work per lap
            t0 = time.time()
            run(b, n)
            times[b].append((time.time() - t0) / n)

    total_patches = (3 + 2) * n_valid  # reference 3+2-epoch budget
    print(f"\nn_valid={n_valid}  budget={total_patches} patches")
    print(f"{'batch':>6} {'ms/step':>9} {'patches/s':>11} {'budget_s':>9}")
    for b in batches:
        ts = sorted(times[b])[1:-1]
        ms = 1e3 * float(np.median(ts))
        pps = b / (ms / 1e3)
        print(f"{b:>6} {ms:>9.2f} {pps:>11.0f} {total_patches / pps:>9.1f}")


if __name__ == "__main__":
    main()
