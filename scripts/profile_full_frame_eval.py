"""On-chip A/B of the stage-3 full-frame eval transfer path: f32 host
feature assembly (24 B/px H2D + 12 B/px D2H) vs u8 device-side assembly
(7 B/px H2D + 4 B/px D2H).  The periodic eval of train_stage runs the
generator over every frame of every action; on the tunneled chip the f32
transfers dominated (855 ms/frame: H2D 331 + D2H 263 vs 72 ms compute).

Sync discipline per PERF_NOTES.md: warmup, alternated laps, medians.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import numpy as np

from drawingspinup_tpu.train import gan


def median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    size = 512
    rng = np.random.default_rng(0)
    cfg = gan.GANConfig()
    state = gan.init_state(cfg, jax.random.PRNGKey(0))

    frame_f32 = rng.random((size, size, 6), np.float32)
    x_u8 = rng.integers(0, 256, (size, size, 7), dtype=np.uint8)

    def run_f32():
        return gan.generate_full(cfg, state, frame_f32)

    def run_u8():
        return np.asarray(gan.generate_full_rgba_async(
            cfg, state, x_u8, True, True, True))

    run_f32(); run_u8()   # compile
    laps_f32, laps_u8 = [], []
    for _ in range(9):
        t0 = time.time(); run_f32(); laps_f32.append(time.time() - t0)
        t0 = time.time(); run_u8(); laps_u8.append(time.time() - t0)
    print(f"f32 path : {median(laps_f32)*1e3:7.1f} ms/frame (median of 9)")
    print(f"u8  path : {median(laps_u8)*1e3:7.1f} ms/frame (median of 9)")


if __name__ == "__main__":
    main()
