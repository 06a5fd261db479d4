"""Speed + convergence A/B on the real chip for dense_max_rows: levels
whose grids exceed table_size stored DENSE (one wide cell-row gather per
point) vs hashed (8 row gathers). At the production config this flips
levels 4-5 (res 97/128) — they only UNLOCK at steps 1000/2000, so the
default horizon is the full 3000-step budget. Usage:
bench_dense_rows.py [steps=3000]
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    data = make_sphere_dataset(size=1024)
    base = nsr.NSRConfig()
    finals = {}
    for rows in (1 << 22, 0):
        grid = dataclasses.replace(base.sdf.grid, table_dtype="bfloat16",
                                   dense_max_rows=rows)
        cfg = dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, grid=grid))
        finals[rows] = run(cfg, data, steps, f"dense_max_rows={rows}")
    for k in sorted(finals[0]):
        a, b = finals[1 << 22][k], finals[0][k]
        rel = abs(a - b) / (abs(a) + 1e-9)
        print(f"final {k}: dense={a:.5f} hashed={b:.5f} rel={rel:.3f}")


if __name__ == "__main__":
    main()
