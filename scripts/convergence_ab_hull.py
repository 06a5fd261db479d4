"""Convergence + step-rate A/B on the real chip for the visual-hull
t-ranges (render/hull.py): production config vs hull-enabled at full and
halved per-ray sample budgets. The hull concentrates the fixed sample
budget in a slab around the surface, so the question is whether half the
samples with ~2-4x finer spacing matches (or beats) the full-budget
uniform-span baseline — that would roughly halve the dominant phase of
the NSR step.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from bench_nsr import make_sphere_dataset
from convergence_ab import run
from drawingspinup_tpu.train import nsr


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    base = nsr.NSRConfig()
    grid = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                               compute_dtype="bfloat16")
    base = dataclasses.replace(base,
                               sdf=dataclasses.replace(base.sdf, grid=grid))
    data_plain = make_sphere_dataset(size=1024)
    data_hull = make_sphere_dataset(size=1024, hull=True)

    arms = [
        ("base-64/64", base, data_plain),
        ("hull-64/64", base, data_hull),
        ("hull-32/32", dataclasses.replace(base, n_coarse=32, n_fine=32),
         data_hull),
        ("hull-32/16", dataclasses.replace(base, n_coarse=32, n_fine=16),
         data_hull),
    ]
    finals = {}
    for label, cfg, data in arms:
        t0 = time.time()
        finals[label] = run(cfg, data, steps, label)
        finals[label]["_wall"] = time.time() - t0
    keys = [k for k in sorted(finals["base-64/64"]) if k.startswith("loss")]
    for k in keys:
        print(f"final {k}: " + "  ".join(
            f"{lbl}={finals[lbl][k]:.5f}" for lbl, _, _ in arms))


if __name__ == "__main__":
    main()
