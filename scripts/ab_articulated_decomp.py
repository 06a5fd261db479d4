"""Decompose the articulated-figure quality gap (shipped vs parity, VERDICT
r2 #7): four analytic-grad bf16 arms isolate the hull and the 32/32 sample
budget; parity numbers come from convergence_ab_figure.py --articulated.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import numpy as np

from bench_nsr import ARTICULATED_SPHERES, make_figure_dataset
from convergence_ab_figure import run_arm
from drawingspinup_tpu.core.config import load_config
from drawingspinup_tpu.pipelines.stage2_recon import nsr_config_from_yaml


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    shipped = nsr_config_from_yaml(load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "drawingspinup_tpu", "configs", "neus-ortho.yaml")))
    data_plain = make_figure_dataset(size=1024, spheres=ARTICULATED_SPHERES)
    data_hull = make_figure_dataset(size=1024, hull=True,
                                    spheres=ARTICULATED_SPHERES,
                                    scene_radius=shipped.radius)
    arms = [
        ("hull-32/32", shipped, data_hull),
        ("hull-64/64", dataclasses.replace(shipped, n_coarse=64, n_fine=64),
         data_hull),
        ("nohull-64/64", dataclasses.replace(shipped, n_coarse=64, n_fine=64,
                                             hull_trange=False), data_plain),
        ("nohull-32/32", dataclasses.replace(shipped, hull_trange=False),
         data_plain),
    ]
    results = {}
    for label, cfg, data in arms:
        run_arm(label, cfg, data, steps, results,
                spheres=ARTICULATED_SPHERES)
    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]}" for lbl, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
