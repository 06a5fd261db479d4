"""Re-test lax.scan step-chunking for the stage-3 GAN loop at the CURRENT
(Pallas-RIC) step cost.

History: scan-chunking was measured NEGATIVE pre-Pallas (PERF_NOTES r3,
steps 21-43 ms — dispatch fully hidden) and the compile was per-uid. Two
things changed: the step is now ~12.4 ms with an ~4 ms dependent-chain gap
(independent chained dispatches sustain 8.35 ms — scripts/bench_ric_pallas
vs bench_gan_dispatch), and bucket-padding (f5aa849) gives ONE program
shape across all uids, so a scan compile is once per sweep, not per uid.

Arms (alternated, one D2H sync per lap):
  loop     — production per-step dispatch (12.4 ms baseline)
  scan10   — jitted lax.scan of 10 steps, key fold_in(step) in-graph
  scan50   — same, 50 steps
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData
from drawingspinup_tpu.train import gan

STEPS = 200
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

    @partial(jax.jit, static_argnames=("cfg", "k_steps"))
    def scan_steps(cfg, k_steps, state, data, base_key):
        def body(state, _):
            k = jax.random.fold_in(base_key, state.step)
            state, logs = gan.train_step(cfg, state, data, k)
            return state, logs["g_loss"]
        state, losses = jax.lax.scan(body, state, None, length=k_steps)
        return state, losses[-1]

    def run_loop(state):
        key = jax.random.PRNGKey(1)
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            state, logs = gan.train_step(cfg, state, data, k)
        return logs["g_loss"]

    def make_scan_arm(k_steps):
        def run(state):
            base = jax.random.PRNGKey(1)
            loss = None
            for _ in range(STEPS // k_steps):
                state, loss = scan_steps(cfg, k_steps, state, data, base)
            return loss
        return run

    arms = {"loop": run_loop, "scan10": make_scan_arm(10),
            "scan50": make_scan_arm(50)}

    for name, fn in arms.items():
        t0 = time.time()
        float(fn(state0))
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)

    times = {n: [] for n in arms}
    for lap in range(LAPS):
        for name, fn in arms.items():
            t0 = time.time()
            float(fn(state0))
            times[name].append((time.time() - t0) / STEPS * 1000)
    print("medians (ms/step):")
    for name, ts in times.items():
        print(f"  {name}: {np.median(ts):.2f}  (laps: "
              + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
