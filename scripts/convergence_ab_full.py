"""Full-schedule convergence A/B on the real chip: round-1 production
config (f32 compute, 64/64 samples, uniform AABB spans) vs the round-2
shipped config (bf16 compute dtype + visual-hull t-ranges + 32/32) over
the COMPLETE 3000-step progressive schedule — the 600-step A/Bs only
exercised the first band phase (n_active=4). Gates on a held-out render:
front-view PSNR vs the analytic sphere for rgb / normal / mask.
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
from convergence_ab import run
from drawingspinup_tpu.render.cameras import view_matrices
from drawingspinup_tpu.train import nsr


def psnr(a, b, mask=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if mask is not None:
        m = np.asarray(mask, bool)
        a, b = a[m], b[m]
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def eval_render(cfg, params, data, size=256):
    c2ws, _ = view_matrices(["front"])
    out = nsr.render_image(cfg, params, c2ws[0], size, size)
    import jax.image as jim
    gt_rgb = np.asarray(jax.image.resize(data["images"][0],
                                         (size, size, 3), "linear"))
    gt_mask = np.asarray(jax.image.resize(data["masks"][0],
                                          (size, size), "linear")) > 0.5
    rgb = np.asarray(out["comp_rgb"])
    op = np.asarray(out["opacity"])[..., 0]
    return {
        "psnr_rgb_fg": psnr(rgb, gt_rgb, np.broadcast_to(
            gt_mask[..., None], rgb.shape)),
        "mask_iou": float((((op > 0.5) & gt_mask).sum())
                          / max((((op > 0.5) | gt_mask).sum()), 1)),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    base = nsr.NSRConfig()
    g_r1 = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16")
    cfg_r1 = dataclasses.replace(
        base, sdf=dataclasses.replace(base.sdf, grid=g_r1),
        n_coarse=64, n_fine=64)
    g_r2 = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                               compute_dtype="bfloat16")
    cfg_r2 = dataclasses.replace(
        base, sdf=dataclasses.replace(base.sdf, grid=g_r2),
        n_coarse=32, n_fine=32)
    data_plain = make_sphere_dataset(size=1024)
    data_hull = make_sphere_dataset(size=1024, hull=True)

    # training states must come back for the render check — rebuild run()'s
    # loop here so we keep the final params
    import convergence_ab

    results = {}
    for label, cfg, data in (("round1-f32-64/64", cfg_r1, data_plain),
                             ("round2-bf16-hull-32/32", cfg_r2, data_hull)):
        tx = nsr.make_optimizer(cfg)
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        for step in range(steps):
            key, k = jax.random.split(key)
            n_active = cfg.sdf.grid.current_level(step)
            state, logs = nsr.train_step(cfg, tx, state, data, k,
                                         n_active=n_active)
            if step % 500 == 0 or step == steps - 1:
                print(f"[{label}] step {step}: "
                      f"loss={float(logs['loss']):.5f}", flush=True)
        print(f"[{label}] {steps} steps in {time.time() - t0:.1f}s",
              flush=True)
        m = eval_render(cfg, state.params, data)
        m.update({k: float(v) for k, v in logs.items()
                  if k.startswith("loss")})
        results[label] = m

    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]:.5f}" for lbl, v in results.items()))


if __name__ == "__main__":
    main()
