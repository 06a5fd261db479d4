"""Ablation decomposition of the production NSR train step (6 active
levels, bf16 tables): time the REAL train_step under config ablations to
attribute milliseconds to components without building fragile micro-graphs
(a hand-built grad-of-analytic-jacobian graph SIGILLs the TPU compiler).

Sync discipline per PERF_NOTES.md (amortize >=10 iters per D2H read).
"""
import os
import sys
import time
import dataclasses
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset

N_ACTIVE = 6


def bf16(cfg):
    grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16")
    return dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf,
                                                            grid=grid))


def time_step(cfg, data, label, n=10, fwd_only=False):
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    if fwd_only:
        @jax.jit
        def run(params, step, k):
            k_pix, k_render = jax.random.split(k)
            ro, rd, tg = nsr.sample_pixel_rays(k_pix, data,
                                               cfg.train_num_rays)
            out = nsr.render_rays(cfg, params, ro, rd, k_render, step,
                                  train=True, n_active=N_ACTIVE)
            out["rays_d"] = rd
            return nsr.compute_losses(cfg, out, tg)[0]

        loss = run(state.params, state.step, key)
        _ = float(loss)
        t0 = time.time()
        for i in range(n):
            loss = run(state.params, state.step, jax.random.fold_in(key, i))
        _ = float(loss)
    else:
        st, logs = nsr.train_step(cfg, tx, state, data, key,
                                  n_active=N_ACTIVE)
        _ = float(logs["loss"])
        t0 = time.time()
        for i in range(n):
            st, logs = nsr.train_step(cfg, tx, st, data,
                                      jax.random.fold_in(key, i),
                                      n_active=N_ACTIVE)
        _ = float(logs["loss"])
    dt = (time.time() - t0) / n * 1000
    print(f"{label:44s} {dt:7.1f} ms")
    return dt


def main():
    base = bf16(nsr.NSRConfig())
    data = make_sphere_dataset(size=1024)

    full = time_step(base, data, "FULL step (R=2048, 64+64, probes 2048)")
    time_step(base, data, "forward+loss only", fwd_only=True)
    time_step(dataclasses.replace(base, n_random_pts=8), data,
              "no random probes (8 pts)")
    time_step(dataclasses.replace(base, n_coarse=8), data,
              "coarse pass 8 (importance source degraded)")
    time_step(dataclasses.replace(base, n_fine=8), data,
              "fine add 8 (S=72)")
    time_step(dataclasses.replace(base, train_num_rays=1024), data,
              "half rays (R=1024)")
    time_step(dataclasses.replace(base, n_coarse=32, n_fine=32), data,
              "S=64 (32+32)")
    print(f"(baseline {full:.1f} ms)")


if __name__ == "__main__":
    main()
