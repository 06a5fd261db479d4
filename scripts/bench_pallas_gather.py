"""Measure the two Pallas gather designs from the roadmap (VERDICT r4 next
#1) against XLA's row gather at the production hash-encode shapes:

  xla     tab[idx] — the baseline the train step uses (via jnp indexing)
  rowdma  per-row async DMA HBM→VMEM, NSLOTS outstanding (scalar-prefetched
          indices drive `tab_ref.at[idx]` sliced DMAs)
  vmemds  whole table resident in VMEM; per-row scalar `pl.ds` dynamic
          slices (only for tables that fit — levels 0-3 widened ≤ 13 MB)

Shapes: widened dense cell-row tables (T, 16) bf16 — level-5 (129³ rows,
68 MB; rowdma only) and level-3 (74³ rows, 13 MB; both kernels) — with
K=262144 uniform random row indices (the per-step index count of the
phase-6 production NSR step is ~1.2 M across 6 levels; per-level slices
are this size). Reports M rows/s per arm, alternated laps, medians.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048
NSLOTS = 16
C = 16


def rowdma_kernel(idx_ref, tab_ref, out_ref, sem_ref):
    i = pl.program_id(0)
    base = i * BLK

    def dma(j):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[base + j]], out_ref.at[j],
            sem_ref.at[jax.lax.rem(j, NSLOTS)])

    def warm(j, _):
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, NSLOTS, warm, 0)

    def body(j, _):
        dma(j).wait()

        @pl.when(j + NSLOTS < BLK)
        def _():
            dma(j + NSLOTS).start()
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


def vmemds_kernel(idx_ref, tab_ref, out_ref):
    i = pl.program_id(0)
    base = i * BLK

    def body(j, _):
        out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(idx_ref[base + j], 1), :]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


@functools.partial(jax.jit, static_argnames=("kind",))
def pallas_gather(tab, idx, kind):
    K = idx.shape[0]
    grid = K // BLK
    if kind == "rowdma":
        return pl.pallas_call(
            rowdma_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((BLK, C), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((NSLOTS,))],
            ),
            out_shape=jax.ShapeDtypeStruct((K, C), tab.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx, tab)
    return pl.pallas_call(
        vmemds_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, C), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((K, C), tab.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, tab)


@jax.jit
def xla_gather(tab, idx):
    return tab[idx]


def timed(fn, tab, idx, label, n=10, laps=5):
    try:
        out = fn(tab, idx)
        np.asarray(out[:1, :1])
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    times = []
    for _ in range(laps):
        t0 = time.time()
        for _ in range(n):
            out = fn(tab, idx)
        np.asarray(out[:1, :1])
        times.append((time.time() - t0) / n)
    med = float(np.median(times[1:]))
    rate = idx.shape[0] / med / 1e6
    print(f"{label}: {med * 1000:.2f} ms → {rate:.1f} M rows/s  "
          f"laps_ms={[round(t * 1000, 2) for t in times]}", flush=True)
    return rate


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("arm", choices=("xla", "vmemds", "rowdma"))
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--k", type=int, default=262144)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    K = args.k
    T = 129 ** 3 if args.big else 74 ** 3
    tab = jnp.asarray(rng.standard_normal((T, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, K), jnp.int32)
    print(f"--- table ({T}, {C}) bf16 = {T * C * 2 / 1e6:.0f} MB, K={K} ---",
          flush=True)
    if args.arm == "xla":
        timed(xla_gather, tab, idx, "xla row gather")
    else:
        timed(functools.partial(pallas_gather, kind=args.arm), tab, idx,
              f"pallas {args.arm}")


if __name__ == "__main__":
    main()
