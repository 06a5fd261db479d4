"""Alternated-arm speed A/B: HashGridConfig.compute_dtype f32 vs bf16
(bf16 tables both arms, production shapes, n_active=6). Medians over
interleaved laps — immune to remote program-load order bias."""
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


def with_cdt(cfg, cdt):
    grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16",
                               compute_dtype=cdt)
    return dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf,
                                                            grid=grid))


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
    data = make_sphere_dataset(size=1024)
    base = nsr.NSRConfig()
    arms = {cdt: build_arm(with_cdt(base, cdt), data)
            for cdt in ("float32", "bfloat16")}
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
        print(f"{name:10s} {float(np.median(vals)):7.1f} ms")


if __name__ == "__main__":
    main()
