"""Alternated-arm decomposition of the NSR train step (round 2).

The round-1 ablation table (profile_nsr_parts.py) measured each arm ONCE in
sequence, so the per-arm numbers carry the remote service's first-load
penalty unevenly (the first-measured arm reads 25-45% high, PERF_NOTES.md).
This script interleaves every ablation arm with the FULL-step arm in
round-robin over several laps and reports medians — deltas survive
program-reload noise.

Arms (all at n_active=6, bf16 tables, production shapes):
  full          — the production step
  fwd_only      — forward+loss only (no grad/optimizer)
  probes8       — n_random_pts 8 (sparsity/smoothness probes ~gone)
  coarse8       — n_coarse 8 (importance source degraded)
  fine8         — n_fine 8
  rays1024      — half rays
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
from drawingspinup_tpu.train import nsr

N_ACTIVE = 6


def bf16(cfg):
    grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16")
    return dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf,
                                                            grid=grid))


def build_arm(cfg, data, fwd_only=False):
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
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

        def step_fn(key):
            return float(run(state.params, state.step, key))
    else:
        holder = {"state": state}

        def step_fn(key):
            st, logs = nsr.train_step(cfg, tx, holder["state"], data, key,
                                      n_active=N_ACTIVE)
            holder["state"] = st
            return float(logs["loss"])

    return step_fn


def main():
    base = bf16(nsr.NSRConfig())
    data = make_sphere_dataset(size=1024)
    arms = {
        "full": build_arm(base, data),
        "fwd_only": build_arm(base, data, fwd_only=True),
        "probes8": build_arm(dataclasses.replace(base, n_random_pts=8), data),
        "coarse8": build_arm(dataclasses.replace(base, n_coarse=8), data),
        "fine8": build_arm(dataclasses.replace(base, n_fine=8), data),
        "rays1024": build_arm(dataclasses.replace(base, train_num_rays=1024),
                              data),
    }
    key = jax.random.PRNGKey(1)
    # compile + first-execution for every arm
    for name, fn in arms.items():
        t0 = time.time()
        fn(jax.random.fold_in(key, hash(name) % 1000))
        print(f"[compile+load] {name}: {time.time() - t0:.0f}s", flush=True)

    laps = 5
    n_inner = 8
    results = {k: [] for k in arms}
    for lap in range(laps):
        for name, fn in arms.items():
            fn(jax.random.fold_in(key, 5000 + lap))     # re-warm after swap
            t0 = time.time()
            for i in range(n_inner):
                fn(jax.random.fold_in(key, lap * 1000 + i))
            dt = (time.time() - t0) / n_inner * 1000
            results[name].append(dt)
        print(f"lap {lap}: " + "  ".join(
            f"{k}={v[-1]:.0f}" for k, v in results.items()), flush=True)

    print("\nmedians over laps:")
    full = float(np.median(results["full"]))
    for name, vals in results.items():
        med = float(np.median(vals))
        print(f"{name:10s} {med:7.1f} ms   Δ vs full {full - med:+7.1f}")


if __name__ == "__main__":
    main()
