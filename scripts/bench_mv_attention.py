"""Microbench the MV-diffusion attention core at the folded production
shapes: XLA dot_product_attention (current) vs the Pallas TPU flash kernel.

Context (PERF_NOTES r4): the MV denoise step is ~93 ms and query-folding
the KV duplication away changed nothing — the step is bound by the
materialized (B, heads, Sq, Sk) attention probabilities (level-0 MV
attention writes+reads ~2.4 GB f32 per instance). Flash attention never
materializes them.

Shapes (12 views×domains, 32² latents, heads=8):
  MV fold     level0 (2, 8, 6144, 40)   level1 (2, 8, 1536, 80)   level2 (2, 8, 384, 160)
  joint fold  level0 (6, 8, 2048, 40)   level1 (6, 8, 512, 80)    level2 (6, 8, 128, 160)

Sync discipline per PERF_NOTES.md (alternated laps, chained iters, one D2H).
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
from jax.experimental.pallas.ops.tpu import flash_attention as fa

SHAPES = [
    ("mv_l0", (2, 8, 6144, 40)),
    ("joint_l0", (6, 8, 2048, 40)),
    ("mv_l1", (2, 8, 1536, 80)),
    ("joint_l1", (6, 8, 512, 80)),
    ("mv_l2", (2, 8, 384, 160)),
    ("joint_l2", (6, 8, 128, 160)),
]
ITERS = 20


def run_xla(q, k, v):
    # current core: jax.nn.dot_product_attention over (B, S, H, D)
    out = jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2))
    return out.swapaxes(1, 2)


def run_flash(q, k, v):
    d = q.shape[-1]
    return fa.flash_attention(q, k, v, sm_scale=1.0 / np.sqrt(d),
                              causal=False)


def timed(fn, q, k, v, label):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            o = fn(q + acc * 1e-20, k, v)
            return acc + jnp.mean(o)
        return jax.lax.fori_loop(0, ITERS, body, jnp.asarray(0.0, q.dtype))

    try:
        r = loop(q, k, v)
        np.asarray(r)
        t0 = time.time()
        r = loop(q, k, v)
        np.asarray(r)
        ms = (time.time() - t0) / ITERS * 1000
        print(f"  {label}: {ms:7.2f} ms")
        return ms
    except Exception as e:
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    total = {}
    for name, (b, h, s, d) in SHAPES:
        print(f"{name} (B={b} H={h} S={s} D={d})")
        for dt in (jnp.float32, jnp.bfloat16):
            q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                         (b, h, s, d), dt) for i in range(3))
            # parity check once (f32 flash vs xla)
            for label, fn in (("xla", run_xla), ("flash", run_flash)):
                ms = timed(fn, q, k, v, f"{label} {np.dtype(dt).name}")
                if ms is not None:
                    total.setdefault((label, np.dtype(dt).name), 0.0)
                    total[(label, np.dtype(dt).name)] += ms
        # numeric parity f32
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (b, h, s, d), jnp.float32)
                   for i in range(3))
        try:
            # both cores scale q by 1/sqrt(d) internally
            a = np.asarray(run_xla(q, k, v))
            bfl = np.asarray(run_flash(q, k, v))
            print(f"  |xla-flash| max={np.abs(a - bfl).max():.2e}")
        except Exception as e:
            print(f"  parity check failed: {e}")
    print("totals (sum over one instance of each shape):")
    for kk, vv in sorted(total.items()):
        print(f"  {kk}: {vv:.2f} ms")


if __name__ == "__main__":
    main()
