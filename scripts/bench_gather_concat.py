"""Does fusing the 6 per-level cell-row gathers into ONE gather from a
concatenated table recover the standalone gather rate? In-graph the
phase-6 step gathers ~200k wide rows from each of 6 per-level widened
tables (33 M rows/s effective, ablation r5) while a single standalone
gather of 262k rows runs 58-66 M rows/s. Arms (all one jit):

  perlevel   6 gathers, one per level table (the current encode structure)
  concat     offset indices into one concatenated (ΣT, 16) table, 1 gather
  perlevel_scat / concat_scat   same, plus the matching backward-style
             scatter-add of the gathered rows (cotangent proxy)
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

C = 16
# production active-level widened row counts (res+1)³, res 32..128
SIZES = [33 ** 3, 43 ** 3, 56 ** 3, 74 ** 3, 98 ** 3, 129 ** 3]
K = 200_000


@jax.jit
def perlevel(tabs, idxs):
    return [t[i] for t, i in zip(tabs, idxs)]


@jax.jit
def concat_gather(big, idx_all):
    return big[idx_all]


@jax.jit
def perlevel_scat(tabs, idxs, vals):
    return [jnp.zeros_like(t).at[i].add(v)
            for t, i, v in zip(tabs, idxs, vals)]


@jax.jit
def concat_scat(big, idx_all, vals_all):
    return jnp.zeros_like(big).at[idx_all].add(vals_all)


def timed(fn, args, label, n=10, laps=5, rows=0):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    times = []
    for _ in range(laps):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        times.append((time.time() - t0) / n * 1000)
    med = float(np.median(times[1:]))
    print(f"{label}: {med:.2f} ms → {rows / med / 1e3:.1f} M rows/s  "
          f"laps={[round(t, 2) for t in times]}", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    tabs = [jnp.asarray(rng.standard_normal((T, C)), jnp.bfloat16)
            for T in SIZES]
    idxs = [jnp.asarray(rng.integers(0, T, K), jnp.int32) for T in SIZES]
    vals = [jnp.asarray(rng.standard_normal((K, C)), jnp.bfloat16)
            for _ in SIZES]
    offs = np.cumsum([0] + SIZES[:-1])
    big = jnp.concatenate(tabs, axis=0)
    idx_all = jnp.concatenate([i + int(o) for i, o in zip(idxs, offs)])
    vals_all = jnp.concatenate(vals, axis=0)
    rows = K * len(SIZES)
    print(f"total rows/step {rows}, concat table "
          f"{sum(SIZES) * C * 2 / 1e6:.0f} MB", flush=True)
    timed(perlevel, (tabs, idxs), "perlevel gather x6", rows=rows)
    timed(concat_gather, (big, idx_all), "concat gather x1", rows=rows)
    timed(perlevel_scat, (tabs, idxs, vals), "perlevel scatter x6", rows=rows)
    timed(concat_scat, (big, idx_all, vals_all), "concat scatter x1",
          rows=rows)


if __name__ == "__main__":
    main()
