"""On-chip A/B: per-step host PRNG-key splits vs in-graph key derivation.

The production stage-3 loop (pipelines/stage3_translate.py::train_stage)
does `key, k = jax.random.split(key)` on the HOST every step — one extra
tiny program dispatch per train step through the axon tunnel — then calls
gan.train_step. scripts/bench_ric_pallas.py measured the bare train step at
8.35 ms while bench_stage3 (which replicates the production loop) measures
~13.3 ms; this probe decomposes that gap.

Arms (alternated laps, D2H-synced at lap end, trimmed medians):
  split    — production loop: host jax.random.split per step
  foldin   — constant base key, jax.random.fold_in(key, state.step) INSIDE
             the jitted step (one dispatch per step, stream differs)
  donate   — foldin + donate_argnums on the state (buffer reuse)
"""
import os
import sys
import time
from functools import partial

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


@partial(jax.jit, static_argnames=("cfg",))
def step_foldin(cfg, state, data, base_key):
    k = jax.random.fold_in(base_key, state.step)
    return gan.train_step(cfg, state, data, k)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def step_donate(cfg, state, data, base_key):
    k = jax.random.fold_in(base_key, state.step)
    return gan.train_step(cfg, state, data, k)


def main():
    data = make_data()
    cfg = gan.GANConfig()
    state0 = gan.init_state(cfg, jax.random.PRNGKey(0))
    base = jax.random.PRNGKey(1)

    def run_split(n):
        s, key = state0, base
        for _ in range(n):
            key, k = jax.random.split(key)
            s, logs = gan.train_step(cfg, s, data, k)
        return float(logs["g_loss"])

    def run_foldin(n):
        s = state0
        for _ in range(n):
            s, logs = step_foldin(cfg, s, data, base)
        return float(logs["g_loss"])

    def run_donate(n):
        # donated state: re-init a private copy per lap
        s = jax.tree.map(jnp.copy, state0)
        for _ in range(n):
            s, logs = step_donate(cfg, s, data, base)
        return float(logs["g_loss"])

    arms = {"split": run_split, "foldin": run_foldin, "donate": run_donate}
    for name, fn in arms.items():
        t0 = time.time()
        fn(2)
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)

    N = 30
    times = {n: [] for n in arms}
    for lap in range(8):
        for name, fn in arms.items():
            t0 = time.time()
            fn(N)
            times[name].append((time.time() - t0) / N)
    print(f"\nper-step medians over {N}-step laps (ms):")
    for name, ts in times.items():
        ts = sorted(ts)[1:-1]
        print(f"  {name:8s} {1e3 * float(np.median(ts)):7.2f}  "
              f"(min {1e3 * ts[0]:.2f})")


if __name__ == "__main__":
    main()
