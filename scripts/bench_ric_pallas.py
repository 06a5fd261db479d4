"""On-chip A/B: fused Pallas RICConv vs the XLA "fused" variant.

Arms (alternated laps, D2H-synced, trimmed medians — PERF_NOTES
methodology):
  xla_fwd / pallas_fwd    — generator forward, production patch batch
  xla_step / pallas_step  — full gan.train_step with each ric_variant
Adoption gate: pallas_step must beat xla_step; math parity is asserted by
tests/test_ric_pallas.py (interpret) and re-checked here on chip.
"""
import dataclasses
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


def make_data(size=512):
    rng = np.random.default_rng(0)
    return KeyframeData(
        pre=jnp.asarray(rng.random((size, size, 6)), jnp.float32),
        post=jnp.asarray(rng.random((size, size, 3)), jnp.float32),
        mask=jnp.ones((size, size), jnp.float32),
        valid_yx=jnp.asarray(rng.integers(16, size - 16, (4000, 2)),
                             jnp.int32))


def main():
    data = make_data()
    # Pin BOTH variants explicitly: the GANConfig default flipped to
    # "pallas" at adoption, which silently turned `GANConfig()` into a
    # pallas-vs-pallas self-comparison (caught 2026-08-19 when the arms
    # came back bit-identical, max fwd diff 0.00e+00).
    cfg_x = dataclasses.replace(gan.GANConfig(), ric_variant="fused")
    cfg_p = dataclasses.replace(gan.GANConfig(), ric_variant="pallas")

    state = gan.init_state(cfg_x, jax.random.PRNGKey(0))
    gen_x, _, _ = gan.build_models(cfg_x)
    gen_p, _, _ = gan.build_models(cfg_p)
    key = jax.random.PRNGKey(1)
    batch = jax.jit(lambda k: sample_patches(data, k, cfg_x.batch_size,
                                             cfg_x.patch_size))(key)

    @jax.jit
    def fwd_x(p, pre):
        return gen_x.apply({"params": p, "batch_stats": state.g_stats}, pre,
                           train=True, mutable=["batch_stats"])[0]

    @jax.jit
    def fwd_p(p, pre):
        return gen_p.apply({"params": p, "batch_stats": state.g_stats}, pre,
                           train=True, mutable=["batch_stats"])[0]

    # The step arms must RETURN the updated state: an outer jit that only
    # returned g_loss (computed before the parameter update) let XLA
    # dead-code-eliminate the backward pass + optimizer, so the "full step"
    # numbers it printed were forward-weighted (found 2026-08-19; the
    # production-loop A/B in bench_stage3.py was unaffected — its
    # gan.train_step jit outputs the whole state).
    @jax.jit
    def step_x(s, k):
        return gan.train_step(cfg_x, s, data, k)

    @jax.jit
    def step_p(s, k):
        return gan.train_step(cfg_p, s, data, k)

    def sync(o):
        return np.asarray(o).ravel()[0]

    t0 = time.time()
    ox = fwd_x(state.g_params, batch["pre"])
    op = fwd_p(state.g_params, batch["pre"])
    err = float(jnp.max(jnp.abs(ox - op)))
    print(f"compile+parity: {time.time() - t0:.1f}s  max fwd diff {err:.2e}",
          flush=True)
    # On chip the fwd diff is dominated by the XLA arm's own MXU bf16
    # truncation: vs a float64 oracle the Pallas kernel is ~2e-7 while the
    # XLA einsum chain is ~1.5e-2/conv (measured 2026-08-18); exact math
    # parity is pinned by tests/test_ric_pallas.py in interpret mode.
    # Gate at ~3x that measured noise floor — tight enough that a broken
    # Mosaic lowering (wrong shift/mask) cannot hide behind bf16 noise.
    assert err < 5e-2, err

    arms = {
        "xla_fwd": lambda k: fwd_x(state.g_params, batch["pre"]),
        "pallas_fwd": lambda k: fwd_p(state.g_params, batch["pre"]),
        "xla_step": lambda k: step_x(state, k)[1]["g_loss"],
        "pallas_step": lambda k: step_p(state, k)[1]["g_loss"],
    }
    for name, fn in arms.items():
        t0 = time.time()
        sync(fn(key))
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)

    times = {n: [] for n in arms}
    for lap in range(10):
        for name, fn in arms.items():
            k = jax.random.fold_in(key, lap)
            t0 = time.time()
            for _ in range(10):
                out = fn(k)
            sync(out)
            times[name].append((time.time() - t0) / 10)
    print("\nmedians (ms):")
    for name, ts in times.items():
        print(f"  {name:12s} {1e3 * float(np.median(sorted(ts)[1:-1])):7.2f}")


if __name__ == "__main__":
    main()
