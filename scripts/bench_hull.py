"""Alternated-arm speed A/B for visual-hull t-ranges + reduced sample
budgets (bf16 tables + bf16 compute both arms, production shapes,
n_active=6). Medians over interleaved laps — immune to remote
program-load order bias. Also times the one-off hull_t_ranges setup."""
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


def prod(base, n_coarse=64, n_fine=64):
    grid = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                               compute_dtype="bfloat16")
    return dataclasses.replace(
        base, sdf=dataclasses.replace(base.sdf, grid=grid),
        n_coarse=n_coarse, n_fine=n_fine)


def build_arm(cfg, data):
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    holder = {"state": state}

    def step_fn(key):
        st, logs = nsr.train_step(cfg, tx, holder["state"], data, key,
                                  n_active=N_ACTIVE)
        holder["state"] = st
        return float(logs["loss"])

    return step_fn


def main():
    base = nsr.NSRConfig()
    data = make_sphere_dataset(size=1024)

    t0 = time.time()
    data_hull = make_sphere_dataset(size=1024, hull=True)
    jax.block_until_ready(data_hull["t_range"])
    print(f"hull_t_ranges setup (1024², 6 views): {time.time() - t0:.1f}s",
          flush=True)

    arms = {
        "base-64/64": build_arm(prod(base), data),
        "hull-32/32": build_arm(prod(base, 32, 32), data_hull),
        "hull-32/16": build_arm(prod(base, 32, 16), data_hull),
    }
    key = jax.random.PRNGKey(1)
    for name, fn in arms.items():
        t0 = time.time()
        fn(jax.random.fold_in(key, hash(name) % 1000))
        print(f"[compile+load] {name}: {time.time() - t0:.0f}s", flush=True)

    laps = 5
    n_inner = 8
    results = {k: [] for k in arms}
    for lap in range(laps):
        for name, fn in arms.items():
            fn(jax.random.fold_in(key, 5000 + lap))
            t0 = time.time()
            for i in range(n_inner):
                fn(jax.random.fold_in(key, lap * 1000 + i))
            results[name].append((time.time() - t0) / n_inner * 1000)
        print("lap %d: " % lap + "  ".join(
            f"{k}={v[-1]:.0f}" for k, v in results.items()), flush=True)

    print("\nmedians over laps:")
    for name, vals in results.items():
        print(f"{name:12s} {float(np.median(vals)):7.1f} ms")


if __name__ == "__main__":
    main()
