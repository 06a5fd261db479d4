"""Disambiguate the convergence_ab_full render gap: train the round-2
config (bf16 cdt + hull + 32/32) once, then evaluate the SAME field at
several eval-time sample budgets. Sampling counts are train-time knobs —
if PSNR recovers at eval-64/64, the field matches round-1 quality and the
gap was an eval-sampling artifact, not a training regression.
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

from bench_nsr import make_sphere_dataset
from convergence_ab_full import eval_render
from drawingspinup_tpu.train import nsr


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    base = nsr.NSRConfig()
    g = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                            compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        base, sdf=dataclasses.replace(base.sdf, grid=g),
        n_coarse=32, n_fine=32)
    data = make_sphere_dataset(size=1024, hull=True)

    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(steps):
        key, k = jax.random.split(key)
        n_active = cfg.sdf.grid.current_level(step)
        state, logs = nsr.train_step(cfg, tx, state, data, k,
                                     n_active=n_active)
        if step % 1000 == 0:
            print(f"step {step}: loss={float(logs['loss']):.5f}", flush=True)
    print(f"{steps} steps in {time.time() - t0:.1f}s", flush=True)

    for nc, nf in ((32, 32), (64, 64), (128, 64), (192, 96)):
        ecfg = dataclasses.replace(cfg, n_coarse=nc, n_fine=nf)
        m = eval_render(ecfg, state.params, data)
        print(f"eval {nc}/{nf}: " + "  ".join(
            f"{k}={v:.5f}" for k, v in m.items()), flush=True)


if __name__ == "__main__":
    main()
