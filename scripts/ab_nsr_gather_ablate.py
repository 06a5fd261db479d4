"""Quantify the TABLE-GATHER share of the production NSR phase-6 step
(VERDICT r4 next #1 groundwork): arm A is the real train step; arm B
monkeypatches hashgrid._level_interp so every per-corner row fetch becomes
a BROADCAST of row 0 (no per-point gather indices forward, no scatter
backward — the 8-corner trilinear/jacobian math and the rest of the graph
are unchanged). A − B = the gather+scatter+widen cost XLA actually pays
inside the fused graph at the current config (dense cell rows: ONE wide
row per point per level — index traffic is already 8× below the r2
per-corner analysis that produced the "19 M indices" figure).

Timing: per-arm laps after a settle run (first execution after a program
load reads 25-45% high, PERF_NOTES.md); median of the later laps.
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
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.models import hashgrid
from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset

N_ACTIVE = 6
REAL_INTERP = hashgrid._level_interp


def fake_level_interp(tab, px, py, pz, r, cfg, with_grad):
    """Row-0 broadcast stand-in: same output structure/flops downstream,
    zero per-point gather indices (and a sum-reduce instead of a scatter
    in the backward)."""
    F = cfg.n_features_per_level
    cdt = jnp.dtype(cfg.compute_dtype)
    P = px.shape[0]
    r_f = float(r)
    fx, fy, fz = px * r_f, py * r_f, pz * r_f
    x0f, y0f, z0f = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    wx, wy, wz = fx - x0f, fy - y0f, fz - z0f
    n_vert = r + 1
    wide = cfg.is_dense(r) and cfg.dense_cell_rows
    if wide:
        rows = jnp.broadcast_to(
            hashgrid._widen_dense(tab, n_vert)[0:1].astype(cdt), (P, 8 * F))
    acc = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    dax = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    day = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    daz = [jnp.zeros(px.shape, cdt) for _ in range(F)]
    corner = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                if wide:
                    pair = rows[:, corner * F:(corner + 1) * F]
                else:
                    pair = jnp.broadcast_to(tab[0:1].astype(cdt), (P, F))
                ux = wx if dx else 1.0 - wx
                uy = wy if dy else 1.0 - wy
                uz = wz if dz else 1.0 - wz
                w = (ux * uy * uz).astype(cdt)
                if with_grad:
                    sx = r_f if dx else -r_f
                    sy = r_f if dy else -r_f
                    sz = r_f if dz else -r_f
                    gx = (sx * uy * uz).astype(cdt)
                    gy = (ux * sy * uz).astype(cdt)
                    gz = (ux * uy * sz).astype(cdt)
                for f in range(F):
                    g = pair[:, f]
                    acc[f] = acc[f] + g * w
                    if with_grad:
                        dax[f] = dax[f] + g * gx
                        day[f] = day[f] + g * gy
                        daz[f] = daz[f] + g * gz
                corner += 1
    if with_grad:
        return acc, dax, day, daz
    return acc


def production_cfg():
    from drawingspinup_tpu.core import load_config
    from drawingspinup_tpu.pipelines import stage2_recon
    yaml = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "drawingspinup_tpu", "configs",
        "neus-ortho.yaml")
    return stage2_recon.nsr_config_from_yaml(load_config(yaml))


def time_arm(cfg, data, label, laps=7, iters=12):
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    times = []
    for lap in range(laps):
        t0 = time.time()
        for _ in range(iters):
            key, k = jax.random.split(key)
            state, logs = nsr.train_step(cfg, tx, state, data, k,
                                         n_active=N_ACTIVE)
        float(logs["loss"])                    # D2H sync
        times.append((time.time() - t0) / iters * 1000)
    med = float(np.median(times[2:]))
    print(f"{label}: {med:.1f} ms/step  laps={[round(t,1) for t in times]}",
          flush=True)
    return med


def stopgrad_level_interp(tab, px, py, pz, r, cfg, with_grad):
    """Real gathers, no table backward: isolates the forward gather cost
    (A − C = backward scatter+transpose, C − B = forward gather)."""
    return REAL_INTERP(jax.lax.stop_gradient(tab), px, py, pz, r, cfg,
                       with_grad)


def main():
    cfg = production_cfg()
    data = make_sphere_dataset(size=1024)
    a = time_arm(cfg, data, "A: production step (real gathers)")
    try:
        hashgrid._level_interp = stopgrad_level_interp
        jax.clear_caches()
        c = time_arm(cfg, data, "C: stop-grad tables (fwd gathers only)")
        hashgrid._level_interp = fake_level_interp
        jax.clear_caches()
        b = time_arm(cfg, data, "B: gather-free broadcast rows")
    finally:
        hashgrid._level_interp = REAL_INTERP
        jax.clear_caches()
    print(f"gather+scatter share: {a - b:.1f} ms "
          f"({(a - b) / a:.0%} of the {a:.1f} ms step); "
          f"forward gathers {c - b:.1f} ms, "
          f"backward scatter+transpose {a - c:.1f} ms")


if __name__ == "__main__":
    main()
