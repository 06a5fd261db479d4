"""Per-layer cost attribution of the RIC conv at the production stage-3
patch shapes (batch 40 x 32^2, GeneratorJ_RIC layer plan).

Methodology: K dependent convs are chained INSIDE one jitted program (the
stage-j loss scalar is folded into stage-j+1's input), and the per-conv
cost is (T[K] - T[1]) / (K - 1). This removes BOTH artifacts the naive
one-conv-per-program timing suffers over the axon tunnel:
  * per-program dispatch (~2-4 ms) swamping sub-ms kernels, and
  * device->host fetches of full activations (~tens of ms at tunnel
    bandwidth) being billed to the kernel.
(The first version of this script measured "fwd 294 ms" for a conv whose
fwd+bwd is <1 ms — both artifacts at once. Numbers from that run are void.)

Arms:
  pallas  kernels/ric_conv.py (production training variant)
  xla     the "fused" XLA einsum formulation (models/generator_j.py)

Knobs:
  DSU_RIC_TARGET_ROWS  rows per Pallas grid step (default: see
                       kernels/ric_conv.py::_TARGET_ROWS) — sweeps the
                       grid-orchestration / VMEM-residency trade.

Usage: python scripts/bench_ric_layers.py [step|fwd|both] [layer-substr]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.kernels.ric_conv import ric_conv, _pick_bt, _TARGET_ROWS
from drawingspinup_tpu.models.generator_j import ric_shifted_weights, shift2d

N = 40  # production patch batch
K = 21  # convs in the long chain (per-conv = (T[K]-T[1])/(K-1))
REPS = 12
CALLS_PER_LAP = 5  # average tunnel-dispatch jitter within a lap

# (H=W, Cin, Cout, count, label) — GeneratorJ_RIC layer plan at patch 32
LAYERS = [
    (32, 3, 32, 1, "conv0"),
    (16, 32, 64, 1, "conv1"),
    (8, 64, 128, 1, "conv2"),
    (8, 128, 128, 14, "res (x14)"),
    (16, 256, 128, 1, "upconv2"),
    (32, 192, 128, 1, "upconv1"),
    (32, 163, 64, 1, "conv_11"),
    (32, 64, 64, 2, "smooth (x2)"),
]

SHIFTS = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]


def ric_xla(x, wk, swf):
    """The "fused" XLA variant's math (generator_j.py::RICConv)."""
    z = jnp.einsum("nhwc,tco->nhwto", x, wk,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("nhwto,ithw->nhwio", z, swf,
                   preferred_element_type=jnp.float32)
    out = None
    for i, (sy, sx) in enumerate(SHIFTS):
        t = shift2d(y[:, :, :, i, :], sy, sx)
        out = t if out is None else out + t
    return out


def make_runner(fn, k, with_bwd, swf):
    def run(x0, wk):
        s = jnp.float32(0.0)
        for _ in range(k):
            xi = x0 * (1.0 + s * 1e-30)
            if with_bwd:
                def loss(w, xi=xi):
                    return (fn(xi, w, swf) ** 2).mean()
                s, _gw = jax.value_and_grad(loss)(wk)
            else:
                s = fn(xi, wk, swf).mean()
        return s
    return jax.jit(run)


def time_runner(run, x0, wk):
    run(x0, wk).block_until_ready()
    laps = []
    for _ in range(REPS):
        t0 = time.time()
        for _ in range(CALLS_PER_LAP):
            r = run(x0, wk)
        r.block_until_ready()
        laps.append((time.time() - t0) / CALLS_PER_LAP)
    return float(np.median(laps))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    sel = sys.argv[2] if len(sys.argv) > 2 else ""
    modes = ["fwd", "step"] if mode == "both" else [mode]
    print(f"target_rows={_TARGET_ROWS}  K={K}  reps={REPS}")
    totals = {}
    for h, ci, co, count, label in LAYERS:
        if sel and sel not in label:
            continue
        swf = jnp.asarray(ric_shifted_weights(h, h))
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (N, h, h, ci), jnp.float32)
        wk = jax.random.normal(key, (9, ci, co), jnp.float32) * 0.05
        bt = _pick_bt(N, h * h)
        line = (f"  {label:12s} hw={h:3d} C={ci:3d}->{co:3d} "
                f"bt={bt:2d} grid={N // bt:2d}  ")
        for m in modes:
            wb = m == "step"
            for arm_name, fn in (("pallas", ric_conv), ("xla", ric_xla)):
                t1 = time_runner(make_runner(fn, 1, wb, swf), x0, wk)
                tk = time_runner(make_runner(fn, K, wb, swf), x0, wk)
                per = 1e3 * (tk - t1) / (K - 1)
                totals[(m, arm_name)] = totals.get((m, arm_name), 0.0) \
                    + per * count
                line += (f"{m}/{arm_name} {per:6.3f} "
                         f"(t1 {1e3 * t1:5.2f} tK {1e3 * tk:6.2f})  ")
        print(line + (f"(x{count})" if count > 1 else ""), flush=True)
    print("\nplan totals (ms):")
    for (m, a), v in sorted(totals.items()):
        print(f"  {m}/{a}: {v:7.2f}")


if __name__ == "__main__":
    main()
