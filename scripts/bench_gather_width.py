"""Row-gather width scaling on the real TPU: is one width-8F row gather
cheaper than 8 width-F gathers? (The dense-level 'widened cell rows' design:
D[idx] holds all 8 trilinear corners, one index per point per level.)

Also times the full trilerp built on widened rows vs the 8-row-gather
baseline, fwd and fwd+table-grad (the fold-back through the in-graph
widening), and checks numerical equality.
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

P = 262144
F = 2
REPS = 20


def timed(fn, *args):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / REPS * 1000.0


def widen(tab, n):
    """(T, F) -> (T, 8F): row idx gains corners idx+{0,1}+n*{0,1}+n^2*{0,1}.
    Out-of-range shifted rows wrap via roll — callers guarantee in-bounds
    indices (x0 clipped to r-1), so wrapped rows are never read."""
    cols = []
    for off in (0, 1, n, n + 1, n * n, n * n + 1, n * n + n, n * n + n + 1):
        cols.append(jnp.roll(tab, -off, axis=0) if off else tab)
    return jnp.concatenate(cols, axis=1)


def trilerp_wide(tab, idx0, w8, n):
    D = widen(tab, n)
    rows = D[idx0].astype(jnp.float32)                   # (P, 8F)
    acc = [jnp.zeros(idx0.shape, jnp.float32) for _ in range(F)]
    for c in range(8):
        for f in range(F):
            acc[f] = acc[f] + rows[:, c * F + f] * w8[c]
    return jnp.stack(acc)


def trilerp_rows(tab, idx8, w8):
    acc = [jnp.zeros(idx8.shape[1], jnp.float32) for _ in range(F)]
    for c in range(8):
        pair = tab[idx8[c]].astype(jnp.float32)
        for f in range(F):
            acc[f] = acc[f] + pair[:, f] * w8[c]
    return jnp.stack(acc)


def main():
    rng = np.random.default_rng(0)
    print(f"P={P}, F={F}, bf16 tables, {REPS} reps")

    # pure gather width scaling
    T = 405224
    for width in (2, 4, 8, 16):
        tab = jnp.asarray(rng.standard_normal((T, width)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, T, P), jnp.int32)
        g = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum(1))
        print(f"  width {width:2d}: {timed(g, tab, idx):6.2f} ms / {P} idx")

    # full trilerp comparison on a dense level
    for n in (33, 74):
        r = n - 1
        T = n ** 3
        tab = jnp.asarray(rng.standard_normal((T, F)), jnp.bfloat16)
        pts = rng.random((P, 3)).astype(np.float32)
        f3 = pts * r
        c0 = np.minimum(np.floor(f3).astype(np.int32), r - 1)
        w = f3 - c0
        wx, wy, wz = (jnp.asarray(w[:, k]) for k in range(3))
        # x-fastest layout: idx = cx + n*cy + n^2*cz; z is the +n^2 stride
        # -> widen offsets (1, n, n^2) map to (dz, dy, dx)?? choose
        # offs (dx->1? ) consistent: corner (dx,dy,dz) -> idx0 + dx + n*dy + n^2*dz
        idx0 = jnp.asarray(c0[:, 0] + n * c0[:, 1] + n * n * c0[:, 2])
        idx8, w8 = [], []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    idx8.append(np.asarray(idx0) + dx + n * dy + n * n * dz)
        idx8 = jnp.asarray(np.stack(idx8))
        for c, (dz, dy, dx) in enumerate([(a, b, cc) for a in (0, 1)
                                          for b in (0, 1) for cc in (0, 1)]):
            ux = wx if dx else 1 - wx
            uy = wy if dy else 1 - wy
            uz = wz if dz else 1 - wz
            w8.append(ux * uy * uz)
        w8 = jnp.stack(w8)

        base = jax.jit(trilerp_rows)
        wide = jax.jit(lambda t, i, ww: trilerp_wide(t, i, ww, n))
        tb = timed(base, tab, idx8, w8)
        tw = timed(wide, tab, idx0, w8)
        a = np.asarray(base(tab, idx8, w8))
        b = np.asarray(wide(tab, idx0, w8))
        err = np.abs(a - b).max()

        gb = jax.jit(jax.grad(lambda t: trilerp_rows(t, idx8, w8).sum()))
        gw = jax.jit(jax.grad(lambda t: trilerp_wide(t, idx0, w8, n).sum()))
        tgb = timed(gb, tab)
        tgw = timed(gw, tab)
        ga = np.asarray(gb(tab).astype(jnp.float32))
        gww = np.asarray(gw(tab).astype(jnp.float32))
        gerr = np.abs(ga - gww).max()
        print(f"n={n:3d}: fwd 8-row {tb:6.2f} | wide {tw:6.2f} ms; "
              f"grad 8-row {tgb:6.2f} | wide {tgw:6.2f} ms; "
              f"err {err:.2e} gerr {gerr:.2e}")


if __name__ == "__main__":
    main()
