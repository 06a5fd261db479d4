"""Decompose the stage-3 GAN train step (53 ms at production config) into
attributable arms, each jitted separately and timed with D2H sync:

  sample   — on-device patch gather only
  g_fwd    — generator forward (train=True, stats mutable)
  g_step   — generator loss fwd+bwd+adam (uses fixed d_params)
  d_step   — discriminator loss fwd+bwd+adam on fixed fake
  vgg_pair — VGG19 features of (fake, post) + squared-diff reduction
  full     — production gan.train_step

Arms run ROUND-ROBIN (alternated) with per-arm medians, immune to
program-reload order bias (see scripts/profile_nsr_alternated.py history).
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
import optax

from drawingspinup_tpu.pipelines.stage3_data import KeyframeData, sample_patches
from drawingspinup_tpu.train import gan


def make_data(size=512):
    rng = np.random.default_rng(0)
    pre = rng.random((size, size, 6), np.float32)
    post = rng.random((size, size, 3), np.float32)
    mask = np.zeros((size, size), np.float32)
    mask[64:448, 64:448] = 1.0
    ys, xs = np.nonzero(mask)
    return KeyframeData(
        pre=jnp.asarray(pre), post=jnp.asarray(post), mask=jnp.asarray(mask),
        valid_yx=jnp.asarray(np.stack([ys, xs], 1).astype(np.int32)))


def main():
    cfg = gan.GANConfig()
    data = make_data()
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    gen, disc, vgg = gan.build_models(cfg)
    g_tx, d_tx = gan.make_optimizers(cfg)

    key = jax.random.PRNGKey(1)
    batch = jax.jit(lambda k: sample_patches(data, k, cfg.batch_size,
                                             cfg.patch_size))(key)
    fake0 = gen.apply({"params": state.g_params,
                       "batch_stats": state.g_stats}, batch["pre"],
                      train=True, mutable=["batch_stats"])[0]

    @jax.jit
    def arm_sample(k):
        return sample_patches(data, k, cfg.batch_size, cfg.patch_size)["pre"]

    @jax.jit
    def arm_g_fwd(g_params, pre):
        out, _ = gen.apply({"params": g_params,
                            "batch_stats": state.g_stats}, pre,
                           train=True, mutable=["batch_stats"])
        return out

    @jax.jit
    def arm_d_step(d_params, d_opt, fake, b):
        def d_loss_fn(p):
            fl, _ = disc.apply({"params": p}, fake * b["pre_mask"])
            tl, _ = disc.apply({"params": p}, b["already"] * b["already_mask"])
            return jnp.mean(fl ** 2) + jnp.mean((tl - 1.0) ** 2)
        loss, grads = jax.value_and_grad(d_loss_fn)(d_params)
        upd, d_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, upd), d_opt, loss

    @jax.jit
    def arm_vgg_pair(vgg_params, fake, post):
        fa = vgg.apply({"params": vgg_params}, fake, as_list=True)
        fb = vgg.apply({"params": vgg_params}, post, as_list=True)
        return sum(jnp.sum((a - b) ** 2) for a, b in zip(fa, fb))

    @jax.jit
    def arm_g_step(g_params, g_opt, b):
        def g_loss_fn(p):
            out, mut = gen.apply({"params": p, "batch_stats": state.g_stats},
                                 b["pre"], train=True,
                                 mutable=["batch_stats"])
            img = jnp.mean(jnp.abs(out - b["post"]))
            fa = vgg.apply({"params": state.vgg_params}, out, as_list=True)
            fb = vgg.apply({"params": state.vgg_params}, b["post"],
                           as_list=True)
            sq = sum(jnp.sum((x - y) ** 2) for x, y in zip(fa, fb))
            numel = sum(int(np.prod(x.shape)) for x in fa)
            fl, _ = disc.apply({"params": state.d_params},
                               out * b["pre_mask"])
            adv = jnp.mean((fl - 1.0) ** 2)
            return (cfg.reconstruction_weight * img
                    + cfg.perception_weight * sq / numel
                    + cfg.adversarial_weight * adv)
        loss, grads = jax.value_and_grad(g_loss_fn)(g_params)
        upd, g_opt = g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, upd), g_opt, loss

    def arm_full(k):
        s, logs = gan.train_step(cfg, state, data, k)
        return logs["g_loss"]

    arms = {
        "sample": lambda k: arm_sample(k),
        "g_fwd": lambda k: arm_g_fwd(state.g_params, batch["pre"]),
        "d_step": lambda k: arm_d_step(state.d_params, state.d_opt, fake0,
                                       batch)[2],
        "vgg_pair": lambda k: arm_vgg_pair(state.vgg_params, fake0,
                                           batch["post"]),
        "g_step": lambda k: arm_g_step(state.g_params, state.g_opt,
                                       batch)[2],
        "full": arm_full,
    }

    def sync(o):
        return np.asarray(o).ravel()[0]

    # compile/warm
    for name, fn in arms.items():
        t0 = time.time()
        sync(fn(key))
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)

    # chained iterations per timing with a real D2H sync at the end —
    # block_until_ready does not fence device completion over the axon
    # tunnel (PERF_NOTES.md), and single dispatches carry 10-30 ms of
    # tunnel latency.
    laps, inner = 10, 8
    times = {n: [] for n in arms}
    for lap in range(laps):
        for name, fn in arms.items():
            key, k = jax.random.split(key)
            t0 = time.time()
            for _ in range(inner):
                out = fn(k)
            sync(out)
            times[name].append((time.time() - t0) / inner)
    print("\narm medians (ms):")
    for name, ts in times.items():
        ts = sorted(ts)[1:-1]
        print(f"  {name:10s} {1e3 * float(np.median(ts)):7.2f}")


if __name__ == "__main__":
    main()
