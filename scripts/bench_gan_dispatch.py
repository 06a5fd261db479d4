"""Measure the stage-3 production-loop dispatch tax: per-step host
`jax.random.split` + arg marshaling vs folding the RNG into the jitted step.

Arms (alternated laps, one D2H sync per lap — PERF_NOTES discipline):
  split   — production loop today: key,k = split(key); train_step(..., k)
            (two RPC dispatches per step: the tiny split program + the step)
  foldin  — step derives k = fold_in(base_key, state.step) in-graph; the
            loop passes the SAME base key every call (one dispatch per step)
  hostkey — like split but the split key is computed with numpy on host
            (one device dispatch per step, host-side key derivation)
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

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData, sample_patches
from drawingspinup_tpu.train import gan

STEPS = 120
LAPS = 5


def make_data(size=512):
    rng = np.random.default_rng(0)
    pre = rng.random((size, size, 6), np.float32)
    post = rng.random((size, size, 3), np.float32)
    mask = np.zeros((size, size), np.float32)
    mask[64:448, 64:448] = 1.0
    ys, xs = np.nonzero(mask)
    return KeyframeData(
        pre=jnp.asarray(pre), post=jnp.asarray(post), mask=jnp.asarray(mask),
        valid_yx=jnp.asarray(np.stack([ys, xs], 1).astype(np.int32)))


def main():
    cfg = gan.GANConfig()
    data = make_data()
    state0 = gan.init_state(cfg, jax.random.PRNGKey(0))

    from functools import partial

    @partial(jax.jit, static_argnames=("cfg",))
    def step_foldin(cfg, state, data, base_key):
        k = jax.random.fold_in(base_key, state.step)
        return gan.train_step(cfg, state, data, k)

    def run_split(state):
        key = jax.random.PRNGKey(1)
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            state, logs = gan.train_step(cfg, state, data, k)
        return state, logs

    def run_foldin(state):
        base = jax.random.PRNGKey(1)
        for _ in range(STEPS):
            state, logs = step_foldin(cfg, state, data, base)
        return state, logs

    def run_hostkey(state):
        for i in range(STEPS):
            k = jnp.asarray(np.array([0, i], np.uint32))
            state, logs = gan.train_step(cfg, state, data, k)
        return state, logs

    arms = {"split": run_split, "foldin": run_foldin, "hostkey": run_hostkey}

    # warm/compile
    for name, fn in arms.items():
        t0 = time.time()
        _, logs = fn(state0)
        float(logs["g_loss"])
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)

    times = {n: [] for n in arms}
    for lap in range(LAPS):
        for name, fn in arms.items():
            t0 = time.time()
            _, logs = fn(state0)
            float(logs["g_loss"])
            times[name].append((time.time() - t0) / STEPS * 1000)
    print("medians (ms/step):")
    for name, ts in times.items():
        print(f"  {name}: {np.median(ts):.2f}  (laps: "
              + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
