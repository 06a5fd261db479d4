"""CLIP vision encoder with projection — flax rebuild.

The reference conditions the MV UNet on CLIP image embeddings
(``pipeline_mvdiffusion_image.py:150-160``, CLIPVisionModelWithProjection of
the SD image-variation pipeline: ViT-L/14 @ 224, hidden 1024, projection
768). Self-contained ViT so the framework carries no dependency on the
deprecated transformers flax classes; weight port in utils/diffusers_port.py.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing constants (openai/clip-vit-large-patch14 processor)
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    projection_dim: int = 768


def preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B, H, W, 3) float [0,1] → normalized (B, size, size, 3)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, size, size, 3), method="bicubic")
    mean = jnp.asarray(IMAGE_MEAN)
    std = jnp.asarray(IMAGE_STD)
    return (x - mean) / std


class CLIPLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        b, s, d = h.shape
        hd = d // c.num_heads
        q = nn.Dense(d, name="q_proj")(h).reshape(b, s, c.num_heads, hd)
        k = nn.Dense(d, name="k_proj")(h).reshape(b, s, c.num_heads, hd)
        v = nn.Dense(d, name="v_proj")(h).reshape(b, s, c.num_heads, hd)
        att = jax.nn.dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, name="out_proj")(att)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(d * c.mlp_ratio, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        return x + nn.Dense(d, name="fc2")(h)


class CLIPVisionModelWithProjection(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, 224, 224, 3) preprocessed → (B, projection_dim) image embeds."""
        c = self.cfg
        b = pixel_values.shape[0]
        n_patches = (c.image_size // c.patch_size) ** 2
        patches = nn.Conv(c.hidden_size,
                          (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size),
                          use_bias=False, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, n_patches, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_patches + 1, c.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layer{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False,
                        name="visual_projection")(pooled)
