"""AutoencoderKL (Stable-Diffusion VAE) — flax rebuild.

The reference uses the stock diffusers VAE inside the Wonder3D pipeline
(``pipeline_mvdiffusion_image.py``: ``vae.encode(...).latent_dist.mode()``
and ``vae.decode(latents / scaling_factor)``). Standard SD-1.x topology:
128/256/512/512 channel encoder with mid self-attention, 4-ch diagonal
Gaussian latent, scaling factor 0.18215. NHWC; torch weight port in
utils/diffusers_port.py.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALING_FACTOR = 0.18215


def _gn(name: str):
    """GroupNorm(32) with adaptive group count for narrow test configs."""
    def apply(x):
        groups = min(32, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name)(x)
    return apply



@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4


class VAEResnet(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = _gn("norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = _gn("norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = _gn("group_norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        att = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(c), axis=-1)
        y = nn.Dense(c, name="to_out")(att @ v)
        return x + y.reshape(n, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for bi, ch in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                h = VAEResnet(ch, name=f"down{bi}_res{li}")(h)
            if bi < len(c.block_out_channels) - 1:
                # SD uses asymmetric (0,1) padding on downsample convs
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down{bi}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = VAEResnet(ch, name="mid_res0")(h)
        h = VAEAttention(name="mid_attn")(h)
        h = VAEResnet(ch, name="mid_res1")(h)
        h = _gn("conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        ch = c.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = VAEResnet(ch, name="mid_res0")(h)
        h = VAEAttention(name="mid_attn")(h)
        h = VAEResnet(ch, name="mid_res1")(h)
        for bi, ch in enumerate(reversed(c.block_out_channels)):
            for li in range(c.layers_per_block + 1):
                h = VAEResnet(ch, name=f"up{bi}_res{li}")(h)
            if bi < len(c.block_out_channels) - 1:
                n, hh, ww, cc = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up{bi}_upsample")(h)
        h = _gn("conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        # quant convs (1×1) around the latent, as in diffusers
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic encode: mode of the diagonal Gaussian, scaled."""
        moments = self.quant_conv(self.encoder(x))
        mean = moments[..., : self.cfg.latent_channels]
        return mean * SCALING_FACTOR

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z / SCALING_FACTOR))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode_mode(x))
