"""Which hull parameter clips quality on the articulated figure?
Arms vary hull_t_ranges' conservatism at the shipped 32/32 budget."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from bench_nsr import ARTICULATED_SPHERES, make_figure_dataset
from convergence_ab_figure import run_arm
from drawingspinup_tpu.core.config import load_config
from drawingspinup_tpu.pipelines.stage2_recon import nsr_config_from_yaml
from drawingspinup_tpu.render.hull import hull_t_ranges


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    shipped = nsr_config_from_yaml(load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "drawingspinup_tpu", "configs", "neus-ortho.yaml")))
    base = make_figure_dataset(size=1024, spheres=ARTICULATED_SPHERES)

    def with_hull(**kw):
        d = dict(base)
        d["t_range"] = hull_t_ranges(base["masks"], base["c2w"],
                                     shipped.radius, **kw)
        return d

    # compute_hw=512 OOMs HBM (6x512x512 rays x 128 march pts in one
    # program) - the conservatism knobs below are the viable levers
    arms = [
        ("hull-d24", with_hull(dilate_px=24)),
        ("hull-pad.15-span.4", with_hull(pad=0.15, min_span=0.4)),
    ]
    results = {}
    for label, data in arms:
        run_arm(label, shipped, data, steps, results,
                spheres=ARTICULATED_SPHERES)
    for k in sorted(next(iter(results.values()))):
        print(f"final {k}: " + "  ".join(
            f"{lbl}={v[k]}" for lbl, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
