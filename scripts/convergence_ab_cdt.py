"""Convergence A/B on the real chip: field compute dtype f32 vs bf16
(HashGridConfig.compute_dtype) at the production bf16-table config. The
bf16 chain includes the spatial jacobian that drives NeuS normal
supervision, so convergence — not just step speed — gates adoption.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from bench_nsr import make_sphere_dataset
from convergence_ab import run
from drawingspinup_tpu.train import nsr


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    data = make_sphere_dataset(size=1024)
    base = nsr.NSRConfig()
    finals = {}
    for cdt in ("float32", "bfloat16"):
        grid = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                                   compute_dtype=cdt)
        cfg = dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, grid=grid))
        finals[cdt] = run(cfg, data, steps, f"compute={cdt}")
    for k in sorted(finals["float32"]):
        a, b = finals["float32"][k], finals["bfloat16"][k]
        rel = abs(a - b) / (abs(a) + 1e-9)
        print(f"final {k}: f32={a:.5f} bf16={b:.5f} rel={rel:.3f}")


if __name__ == "__main__":
    main()
