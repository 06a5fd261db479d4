"""Multi-view conditioned diffusion UNet — flax rebuild of the reference's
``mvdiffusion/models/unet_mv2d_condition.py`` (:176-1054) +
``unet_mv2d_blocks.py``.

SD-1.5 image-variation topology with MV transformer blocks wired in:
  conv_in(8ch: 4 noise ⊕ 4 cond-image latents) → time/class embeddings
  (sinusoidal timesteps; camera sincos ⊕ task one-hots through a projection
  MLP, reference pipeline :271-296) → 3 CrossAttnDownBlockMV2D + DownBlock
  → mid MV block (optional cross-domain attention) → mirrored up blocks with
  skip concats → GN/SiLU/conv_out(4).

All attention variants live in models/attention_mv.py. Layout NHWC; the
weight port from the reference's torch checkpoint is utils/diffusers_port.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.models.attention_mv import TransformerMV2D


@dataclasses.dataclass(frozen=True)
class UNetMVConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    projection_class_embeddings_input_dim: int = 10
    num_views: int = 6
    sparse_mv_attention: bool = False
    # cd_attention_mid/last place joint (cross-domain) attention in EVERY
    # transformer block, exactly as the reference wires them through
    # get_down_block/get_up_block/mid (unet_mv2d_condition.py:482-605 →
    # transformer_mv2d.py:509-527). The Wonder3D-joint checkpoint trains
    # with the mid placement — our production default.
    cd_attention_mid: bool = True
    cd_attention_last: bool = False
    # Accepted-unused, like the reference: its processors take an
    # mvcd_attention kwarg and never read it (transformer_mv2d.py:737 — the
    # fork dropped the upstream domain-folded MV-attention branch).
    mvcd_attention: bool = False


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0): [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class TimestepEmbedMLP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, name="linear_1")(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        t = nn.Dense(self.out_ch, name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


class Upsample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv")(x)


class UNetMV2D(nn.Module):
    cfg: UNetMVConfig = UNetMVConfig()

    def _transformer(self, ch: int, name: str) -> TransformerMV2D:
        c = self.cfg
        return TransformerMV2D(
            heads=c.attention_heads, cross_dim=c.cross_attention_dim,
            num_views=c.num_views, sparse_mv_attention=c.sparse_mv_attention,
            cd_attention_mid=c.cd_attention_mid,
            cd_attention_last=c.cd_attention_last, name=name)

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 class_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """sample (B, H, W, 8); timesteps (B,) or scalar; encoder_hidden_states
        (B, S, cross_dim) CLIP tokens; class_labels (B, proj_dim) camera⊕task
        sincos embeddings."""
        c = self.cfg
        ch0 = c.block_out_channels[0]
        min_hw = 1 << (len(c.block_out_channels) - 1)
        if sample.shape[1] < min_hw or sample.shape[2] < min_hw:
            raise ValueError(
                f"latent {sample.shape[1]}×{sample.shape[2]} too small for "
                f"{len(c.block_out_channels)} UNet levels (needs ≥ {min_hw}): "
                "skip connections cannot align once a downsample floors at 1")
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        # sincos computed in f32 for precision, then cast to the compute
        # dtype so a bf16 sample keeps the whole graph bf16 (f32 leaks here
        # would promote every temb-add downstream back to f32)
        temb = timestep_embedding(timesteps, ch0).astype(sample.dtype)
        temb = TimestepEmbedMLP(ch0 * 4, name="time_embedding")(temb)
        if class_labels is not None:
            temb = temb + TimestepEmbedMLP(
                ch0 * 4, name="class_embedding")(
                class_labels.astype(sample.dtype))

        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(sample)
        skips = [h]

        n_blocks = len(c.block_out_channels)
        for bi, ch in enumerate(c.block_out_channels):
            is_final = bi == n_blocks - 1
            for li in range(c.layers_per_block):
                h = ResnetBlock2D(ch, name=f"down{bi}_res{li}")(h, temb)
                if not is_final:
                    h = self._transformer(ch, f"down{bi}_attn{li}")(
                        h, encoder_hidden_states)
                skips.append(h)
            if not is_final:
                h = Downsample(ch, name=f"down{bi}_downsample")(h)
                skips.append(h)

        ch = c.block_out_channels[-1]
        h = ResnetBlock2D(ch, name="mid_res0")(h, temb)
        h = self._transformer(ch, "mid_attn")(h, encoder_hidden_states)
        h = ResnetBlock2D(ch, name="mid_res1")(h, temb)

        for bi, ch in enumerate(reversed(c.block_out_channels)):
            is_first = bi == 0
            for li in range(c.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch, name=f"up{bi}_res{li}")(h, temb)
                if not is_first:
                    h = self._transformer(ch, f"up{bi}_attn{li}")(
                        h, encoder_hidden_states)
            if bi < n_blocks - 1:
                h = Upsample(ch, name=f"up{bi}_upsample")(h)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, name="conv_out")(h)
