"""Long-horizon convergence A/B: f32 vs bf16 hash tables on the synthetic
sphere at the full production config, with the phase-gated schedule.

Prints loss curves and final per-term losses for both dtypes.
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

from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset


def run(cfg, data, steps, label):
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    logs = None
    for step in range(steps):
        key, k = jax.random.split(key)
        n_active = cfg.sdf.grid.current_level(step)
        state, logs = nsr.train_step(cfg, tx, state, data, k,
                                     n_active=n_active)
        if step % 100 == 0 or step == steps - 1:
            print(f"[{label}] step {step}: loss={float(logs['loss']):.5f} "
                  f"rgb={float(logs['loss_rgb_mse']):.5f} "
                  f"mask={float(logs['loss_mask']):.5f} "
                  f"normal={float(logs['loss_normal']):.5f} "
                  f"inv_s={float(logs['inv_s']):.1f}", flush=True)
    print(f"[{label}] {steps} steps in {time.time() - t0:.1f}s")
    return {k: float(v) for k, v in logs.items()}


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    data = make_sphere_dataset(size=1024)
    base = nsr.NSRConfig()
    finals = {}
    for dt in ("float32", "bfloat16"):
        grid = dataclasses.replace(base.sdf.grid, table_dtype=dt)
        cfg = dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, grid=grid))
        finals[dt] = run(cfg, data, steps, dt)
    for k in sorted(finals["float32"]):
        a, b = finals["float32"][k], finals["bfloat16"][k]
        rel = abs(a - b) / (abs(a) + 1e-9)
        print(f"final {k}: f32={a:.5f} bf16={b:.5f} rel={rel:.3f}")


if __name__ == "__main__":
    main()
