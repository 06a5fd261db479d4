"""Decomposed quality A/B on the thin-figure synthetic (the production
regime for visual-hull sampling — drawn characters are thin; the solid
sphere is the hull's worst case). 3000-step production schedule, held-out
front render PSNR/IoU gate. Arms isolate each round-2 change:
  r1        f32 compute, 64/64, uniform spans
  r1+cdt    bf16 compute, 64/64, uniform     (isolates compute dtype)
  hull48    bf16, 48/48, hull
  hull32    bf16, 32/32, hull                (shipped round-2 config)
Also prints the mean in-mask hull span vs the AABB span.
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

from bench_nsr import make_figure_dataset
from convergence_ab_full import eval_render
from drawingspinup_tpu.train import nsr


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    base = nsr.NSRConfig()

    def cfgv(cdt, nc, nf):
        g = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                                compute_dtype=cdt)
        return dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, grid=g),
            n_coarse=nc, n_fine=nf)

    data_plain = make_figure_dataset(size=1024)
    data_hull = make_figure_dataset(size=1024, hull=True)
    tr = np.asarray(data_hull["t_range"])
    m = np.asarray(data_hull["masks"]) > 0.5
    span = tr[..., 1] - tr[..., 0]
    print(f"figure: mask coverage {m.mean():.3f}, "
          f"mean in-mask hull span {span[m].mean():.3f} "
          f"(AABB span ~2.0)", flush=True)

    arms = [
        ("r1-f32-64/64", cfgv("float32", 64, 64), data_plain),
        ("r1+cdt-64/64", cfgv("bfloat16", 64, 64), data_plain),
        ("hull48-48/48", cfgv("bfloat16", 48, 48), data_hull),
        ("hull32-32/32", cfgv("bfloat16", 32, 32), data_hull),
    ]
    results = {}
    for label, cfg, data in arms:
        tx = nsr.make_optimizer(cfg)
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        for step in range(steps):
            key, k = jax.random.split(key)
            n_active = cfg.sdf.grid.current_level(step)
            state, logs = nsr.train_step(cfg, tx, state, data, k,
                                         n_active=n_active)
            if step % 1000 == 0 or step == steps - 1:
                print(f"[{label}] step {step}: "
                      f"loss={float(logs['loss']):.5f}", flush=True)
        print(f"[{label}] {steps} steps in {time.time() - t0:.1f}s",
              flush=True)
        ecfg = dataclasses.replace(cfg, n_coarse=128, n_fine=64)
        m_ = eval_render(ecfg, state.params, data)
        results[label] = m_
        print(f"[{label}] eval128/64: " + "  ".join(
            f"{k}={v:.5f}" for k, v in m_.items()), flush=True)

    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]:.5f}" for lbl, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
