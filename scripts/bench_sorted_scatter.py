"""Design (b) of VERDICT r4 next #1: index-sorted segmented accumulation
for the NSR backward scatter, vs the direct XLA scatter-add the autodiff
transpose already emits.

The sorted design must pay: argsort(K) + permutation gather of the (K, C)
cotangents + segment-boundary detection + segment_sum + a scatter of the
unique rows. The direct design pays one scatter-add. At the production
shapes (K≈1.2 M wide-row indices per phase-6 step into per-level tables,
duplicates rare at K≪T) the sorted form can only win if argsort+permute
cost less than the duplicate savings — this measures each piece.
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

C = 16


@jax.jit
def direct_scatter(tab0, idx, vals):
    return tab0.at[idx].add(vals)


@jax.jit
def argsort_only(idx):
    return jnp.argsort(idx)


@jax.jit
def sorted_scatter(tab0, idx, vals):
    order = jnp.argsort(idx)
    idx_s = idx[order]
    vals_s = vals[order]                       # (K, C) permutation gather
    starts = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (idx_s[1:] != idx_s[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(starts) - 1               # 0..n_unique-1
    summed = jax.ops.segment_sum(vals_s, seg, num_segments=idx.shape[0])
    # row index of each segment = idx_s at its first element
    first = jnp.where(starts == 1, idx_s, 0)
    seg_rows = jnp.zeros((idx.shape[0],), jnp.int32).at[seg].max(first)
    return tab0.at[seg_rows].add(summed)


def timed(fn, args, label, n=10, laps=5):
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
    print(f"{label}: {med:.2f} ms  laps={[round(t, 2) for t in times]}",
          flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    for T, K in ((129 ** 3, 1 << 20), (74 ** 3, 1 << 18)):
        idx = jnp.asarray(rng.integers(0, T, K), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((K, C)), jnp.float32)
        tab0 = jnp.zeros((T, C), jnp.float32)
        print(f"--- T={T} K={K} C={C} ---")
        a = timed(direct_scatter, (tab0, idx, vals), "direct scatter-add")
        s = timed(argsort_only, (idx,), "argsort alone")
        b = timed(sorted_scatter, (tab0, idx, vals), "sorted+segment+scatter")
        print(f"verdict: sorted form {'LOSES' if b > a else 'wins'} "
              f"({b:.2f} vs {a:.2f} ms; argsort alone {s:.2f})")
        # numerics check (f32 add order differs; tolerance)
        da = direct_scatter(tab0, idx, vals)
        db = sorted_scatter(tab0, idx, vals)
        err = float(jnp.max(jnp.abs(da - db)))
        print(f"max |direct - sorted| = {err:.2e}")


if __name__ == "__main__":
    main()
