"""Microbenchmark: hash-grid gather formulations on the real TPU.

The NSR train step is gather-bound (PERF_NOTES.md): ~25 M gather +
10 M scatter indices/step at 6 active levels, 7-11 ms per million with the
current per-level (T, F) row gathers. For DENSE levels the 8 trilinear
corners form a contiguous 2x2x2 block in a (n, n, n*F) view of the table,
so one lax.gather with slice_sizes (2, 2, 2F) can replace 8 row gathers.
This script measures, per formulation, forward gather time and
forward+backward (scatter transpose) time.

Timing discipline: block_until_ready does not fence over the axon tunnel;
amortize many iterations per scalar D2H readback (PERF_NOTES.md).
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

P = 262144           # points per step (2048 rays x 128 samples)
F = 2
REPS = 20


def timed(fn, *args):
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].sum())  # compile + sync
    t0 = time.time()
    acc = None
    for _ in range(REPS):
        acc = fn(*args)
    _ = float(jax.tree.leaves(acc)[0].sum())
    return (time.time() - t0) / REPS * 1000.0


def row_gather_trilerp(tab, idx8, w8):
    """Current formulation: 8 row gathers from (T, F)."""
    acc = [jnp.zeros(idx8.shape[1], jnp.float32) for _ in range(F)]
    for c in range(8):
        pair = tab[idx8[c]].astype(jnp.float32)          # (P, F)
        for f in range(F):
            acc[f] = acc[f] + pair[:, f] * w8[c]
    return jnp.stack(acc)


def block_gather_trilerp(tab3d, starts, wx, wy, wz, n, r):
    """One (2, 2, 2F) block gather per point from the (n, n, n*F) view.
    Output layout (2, 2, 2F, P): P rides the lanes, tiny dims on sublanes."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    out = jax.lax.gather(
        tab3d, starts, dn, slice_sizes=(2, 2, 2 * F),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)   # (2,2,2F,P)
    out = out.astype(jnp.float32)
    acc = [jnp.zeros(wx.shape, jnp.float32) for _ in range(F)]
    for dx in (0, 1):
        ux = wx if dx else 1.0 - wx
        for dy in (0, 1):
            uy = wy if dy else 1.0 - wy
            for dz in (0, 1):
                uz = wz if dz else 1.0 - wz
                w = ux * uy * uz
                for f in range(F):
                    acc[f] = acc[f] + out[dx, dy, dz * F + f] * w
    return jnp.stack(acc)


def main():
    rng = np.random.default_rng(0)
    print(f"P={P} points, F={F}, {REPS} reps per timing, dtype=bfloat16")
    for n_vert in (33, 74):                 # coarse + finest dense level
        r = n_vert - 1
        T = n_vert ** 3
        tab = jnp.asarray(rng.standard_normal((T, F)), jnp.bfloat16)
        tab3d = tab.reshape(n_vert, n_vert, n_vert * F)
        # random in-cell points
        pts = rng.random((P, 3)).astype(np.float32)
        f3 = pts * r
        c0 = np.minimum(np.floor(f3).astype(np.int32), r - 1)
        w = jnp.asarray(f3 - c0)
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        idx8 = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx8.append((c0[:, 0] + dx) + n_vert *
                                ((c0[:, 1] + dy) + n_vert * (c0[:, 2] + dz)))
        idx8 = jnp.asarray(np.stack(idx8))
        w8 = []
        for dx in (0, 1):
            ux = wx if dx else 1 - wx
            for dy in (0, 1):
                uy = wy if dy else 1 - wy
                for dz in (0, 1):
                    uz = wz if dz else 1 - wz
                    w8.append(ux * uy * uz)
        w8 = jnp.stack(w8)
        starts = jnp.asarray(
            np.stack([c0[:, 0], c0[:, 1], c0[:, 2] * F], 1), jnp.int32)

        row_f = jax.jit(row_gather_trilerp)
        blk_f = jax.jit(lambda t, s, x, y, z: block_gather_trilerp(
            t, s, x, y, z, n_vert, r))
        t_row = timed(row_f, tab, idx8, w8)
        t_blk = timed(blk_f, tab3d, starts, wx, wy, wz)

        # check equality
        a = np.asarray(row_f(tab, idx8, w8))
        b = np.asarray(blk_f(tab3d, starts, wx, wy, wz))
        err = np.abs(a - b).max()

        # fwd+bwd (table grads -> scatter transpose)
        row_g = jax.jit(jax.grad(lambda t: row_gather_trilerp(
            t, idx8, w8).sum()))
        blk_g = jax.jit(jax.grad(lambda t: block_gather_trilerp(
            t, starts, wx, wy, wz, n_vert, r).sum()))
        tg_row = timed(row_g, tab)
        tg_blk = timed(blk_g, tab3d)
        print(f"n={n_vert:3d} (T={T:7d}): fwd row {t_row:6.2f} ms | "
              f"blk {t_blk:6.2f} ms | grad row {tg_row:6.2f} | "
              f"blk {tg_blk:6.2f} | max err {err:.2e}")


if __name__ == "__main__":
    main()
