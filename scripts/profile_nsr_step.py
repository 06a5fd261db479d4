"""Decompose the NSR train-step time: forward-only vs value_and_grad vs
full step (optimizer included). Run on the real TPU.

Each variant is jitted separately; differences isolate the backward pass
and the optimizer/scatter costs. Sync discipline per PERF_NOTES.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import jax
import jax.numpy as jnp
import numpy as np
import optax
from functools import partial

from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset  # noqa: E402


def timeit(fn, n=10):
    out = fn()
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.time() - t0) / n * 1000


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def main():
    cfg = nsr.NSRConfig()
    data = make_sphere_dataset(size=1024)
    tx = nsr.make_optimizer(cfg)
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    @partial(jax.jit, static_argnames=())
    def fwd_only(params, step, k):
        k_pix, k_render = jax.random.split(k)
        ro, rd, tg = nsr.sample_pixel_rays(k_pix, data, cfg.train_num_rays)
        out = nsr.render_rays(cfg, params, ro, rd, k_render, step, train=True)
        out["rays_d"] = rd
        return nsr.compute_losses(cfg, out, tg)[0]

    @partial(jax.jit, static_argnames=())
    def vag(params, step, k):
        k_pix, k_render = jax.random.split(k)
        ro, rd, tg = nsr.sample_pixel_rays(k_pix, data, cfg.train_num_rays)

        def loss_fn(p):
            out = nsr.render_rays(cfg, p, ro, rd, k_render, step, train=True)
            out["rays_d"] = rd
            return nsr.compute_losses(cfg, out, tg)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    @jax.jit
    def full(state, k):
        return nsr.train_step(cfg, tx, state, data, k)

    t_f = timeit(lambda: fwd_only(state.params, state.step, key))
    print(f"forward+loss only:      {t_f:7.1f} ms")
    t_g = timeit(lambda: vag(state.params, state.step, key))
    print(f"value_and_grad:         {t_g:7.1f} ms  (backward ≈ {t_g - t_f:.1f})")
    t_s = timeit(lambda: full(state, key)[0].params)
    print(f"full step (+optimizer): {t_s:7.1f} ms  (optimizer ≈ {t_s - t_g:.1f})")


if __name__ == "__main__":
    main()
