"""Benchmark the MV-diffusion UNet denoise step on the real TPU, f32 vs
bf16, at the production shape (12 views x 32x32 latents, SD-scale UNet).

Sync discipline per PERF_NOTES.md (chained steps + one D2H read).
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

from drawingspinup_tpu.models.unet_mv2d import UNetMV2D, UNetMVConfig


def main():
    cfg = UNetMVConfig()  # SD-scale defaults
    unet = UNetMV2D(cfg)
    nv2, hw = 12, 32
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (nv2, hw, hw, cfg.in_channels))
    t = jnp.asarray(500, jnp.int32)
    ehs = jax.random.normal(key, (nv2, 1, cfg.cross_attention_dim))
    cls = jax.random.normal(
        key, (nv2, cfg.projection_class_embeddings_input_dim))
    params = unet.init(key, sample, t, ehs, cls)["params"]

    @jax.jit
    def run(p, s, e, c):
        def body(i, x):
            eps = unet.apply({"params": p}, x, t, e, c)
            # feed eps back into the first 4 channels to chain the steps
            return x.at[..., :4].add(eps * jnp.asarray(1e-3, x.dtype))
        return jax.lax.fori_loop(0, 10, body, s)

    for dt in (jnp.float32, jnp.bfloat16):
        p = jax.device_put(
            jax.tree_util.tree_map(lambda x: x.astype(dt), params))
        s, e, c = (a.astype(dt) for a in (sample, ehs, cls))

        out = run(p, s, e, c)
        np.asarray(out)[:1]  # sync after compile
        t0 = time.time()
        out = run(p, s, e, c)
        np.asarray(out)[:1]
        ms = (time.time() - t0) / 10 * 1000
        print(f"{np.dtype(dt).name}: {ms:.1f} ms/unet-step "
              f"-> 75-step x2-domain sample ≈ {75 * ms / 1000:.1f} s")


if __name__ == "__main__":
    main()
