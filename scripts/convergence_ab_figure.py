"""Decomposed quality A/B on the thin-figure synthetic (the production
regime for visual-hull sampling — drawn characters are thin; the solid
sphere is the hull's worst case). 3000-step production schedule, held-out
front render PSNR/IoU gate. Arms isolate each round-2 change:
  r1        f32 compute, 64/64, uniform spans
  r1+cdt    bf16 compute, 64/64, uniform     (isolates compute dtype)
  hull48    bf16, 48/48, hull
  hull32    bf16, 32/32, hull                (shipped round-2 config)
Also prints the mean in-mask hull span vs the AABB span.

``--articulated`` (VERDICT r2 next #7) switches to the ASYMMETRIC
articulated figure (self-occlusion, concavities, inter-limb gaps — the
reference's real regime) and gates the SHIPPED production config
(configs/neus-ortho.yaml: bf16, 32/32, hull, analytic grads) against
PARITY mode (the reference's numerical choices: f32, 64/64, no hull,
finite-difference grads — neuralangelo-ortho-wmask.yaml:25-33,133-141) on
held-out render PSNR/IoU AND symmetric chamfer of the extracted 256-grid
mesh against the analytic ground-truth surface.
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


def extract_mesh_chamfer(cfg, params, steps, spheres):
    """256-grid isosurface of the trained field → symmetric chamfer (mesh
    units) against the analytic union-of-spheres surface."""
    from scipy.spatial import cKDTree

    from bench_nsr import sample_spheres_surface, spheres_sdf
    from drawingspinup_tpu.pipelines.stage2_recon import eval_sdf_grid
    from drawingspinup_tpu.render.marching import extract_isosurface

    R = 256
    vmin = np.full(3, -0.7, np.float32)
    vmax = np.full(3, 0.7, np.float32)
    grid = eval_sdf_grid(cfg, params, vmin, vmax, R, step=steps)
    verts, faces = extract_isosurface(grid < 0, sigma=1.0)
    verts = verts / (R - 1) * (vmax - vmin) + vmin
    gt = sample_spheres_surface(spheres, n=20000)
    d_mesh = np.abs(spheres_sdf(verts, spheres))
    d_gt = cKDTree(verts).query(gt, k=1)[0]
    return {"chamfer": float((d_mesh.mean() + d_gt.mean()) / 2),
            "n_verts": len(verts), "n_faces": len(faces)}


def run_arm(label, cfg, data, steps, results, spheres=None):
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
    print(f"[{label}] {steps} steps in {time.time() - t0:.1f}s", flush=True)
    ecfg = dataclasses.replace(cfg, n_coarse=128, n_fine=64)
    m_ = dict(eval_render(ecfg, state.params, data))
    if spheres is not None:
        m_.update(extract_mesh_chamfer(cfg, state.params, steps, spheres))
    results[label] = m_
    print(f"[{label}] eval128/64: " + "  ".join(
        f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
        for k, v in m_.items()), flush=True)
    return state


def main_articulated(steps):
    from bench_nsr import ARTICULATED_SPHERES, make_figure_dataset
    from drawingspinup_tpu.core.config import load_config
    from drawingspinup_tpu.pipelines.stage2_recon import nsr_config_from_yaml

    shipped = nsr_config_from_yaml(load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "drawingspinup_tpu", "configs", "neus-ortho.yaml")))
    g32 = dataclasses.replace(shipped.sdf.grid, table_dtype="float32",
                              compute_dtype="float32")
    parity = dataclasses.replace(
        shipped, sdf=dataclasses.replace(shipped.sdf, grid=g32),
        n_coarse=64, n_fine=64, hull_trange=False,
        grad_type="finite_difference")

    data_plain = make_figure_dataset(size=1024, spheres=ARTICULATED_SPHERES)
    data_hull = make_figure_dataset(size=1024, hull=True,
                                    spheres=ARTICULATED_SPHERES,
                                    scene_radius=shipped.radius)
    m = np.asarray(data_hull["masks"]) > 0.5
    print(f"articulated figure: mask coverage {m.mean():.3f}", flush=True)

    results = {}
    run_arm("parity-f32-64/64-fd-nohull", parity, data_plain, steps,
            results, spheres=ARTICULATED_SPHERES)
    run_arm("shipped-bf16-32/32-hull", shipped, data_hull, steps,
            results, spheres=ARTICULATED_SPHERES)
    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]}" for lbl, v in results.items()), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 3000
    if "--articulated" in sys.argv:
        return main_articulated(steps)
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
        run_arm(label, cfg, data, steps, results)

    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]:.5f}" for lbl, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
