"""Regression check: dilate_px=24 hull on the SYMMETRIC thin figure
(the r2 gate regime) vs the recorded hull-32/32 d8 numbers."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from bench_nsr import make_figure_dataset
from convergence_ab_figure import run_arm
from drawingspinup_tpu.core.config import load_config
from drawingspinup_tpu.pipelines.stage2_recon import nsr_config_from_yaml
from drawingspinup_tpu.render.hull import hull_t_ranges

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
shipped = nsr_config_from_yaml(load_config(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "drawingspinup_tpu", "configs", "neus-ortho.yaml")))
base = make_figure_dataset(size=1024)
results = {}
for label, d in (("fig-d8", 8), ("fig-d24", 24)):
    data = dict(base)
    data["t_range"] = hull_t_ranges(base["masks"], base["c2w"],
                                    shipped.radius, dilate_px=d)
    run_arm(label, shipped, data, steps, results)
for k in sorted(next(iter(results.values()))):
    print(f"final {k}: " + "  ".join(
        f"{lbl}={v[k]}" for lbl, v in results.items()), flush=True)
