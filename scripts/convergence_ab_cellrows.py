"""Convergence A/B on the real chip: dense_cell_rows wide-gather path vs
the per-corner path, both at the production bf16-table config with the
phase-gated schedule. The paths are proven bit-equal in f32 by unit test;
this checks that bf16 cotangent requantization through the in-graph
widening fold-back does not alter convergence.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset
from convergence_ab import run


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    data = make_sphere_dataset(size=1024)
    base = nsr.NSRConfig()
    finals = {}
    for wide in (True, False):
        grid = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                                   dense_cell_rows=wide)
        cfg = dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, grid=grid))
        finals[wide] = run(cfg, data, steps, f"wide={wide}")
    for k in sorted(finals[True]):
        a, b = finals[True][k], finals[False][k]
        rel = abs(a - b) / (abs(a) + 1e-9)
        print(f"final {k}: wide={a:.5f} narrow={b:.5f} rel={rel:.3f}")


if __name__ == "__main__":
    main()
