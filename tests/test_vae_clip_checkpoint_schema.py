"""Checkpoint-coverage tests for the SD VAE and CLIP image-encoder ports
(VERDICT r2 weak #6 / next #4).

Same method as ``test_unet_checkpoint_schema.py``: hand-code the EXPECTED
checkpoint schema (diffusers/transformers key names + torch tensor shapes)
from PUBLIC architecture facts — the SD-1.x ``AutoencoderKL`` (kl-f8:
128/256/512/512 encoder, mid self-attention, 4-ch latent) and the
CLIP ViT-L/14 vision tower with projection (the Wonder3D ``image_encoder``,
``2_charactor_reconstructor/mvdiffusion/pipelines/pipeline_mvdiffusion_image.py``
loads ``CLIPVisionModelWithProjection``) — written independently of this
repo's model code. Then assert mapping our flax trees covers EXACTLY those
keys with EXACTLY those shapes. A dropped block, mis-sized layer, or wrong
emitted key fails offline, without real weights.
"""
from __future__ import annotations

import numpy as np
import pytest

import flax.traverse_util as tu
import jax
import jax.numpy as jnp

from test_checkpoint_ingestion import _invert


# ---------------------------------------------------------------------------
# SD-1.x AutoencoderKL checkpoint schema (public architecture facts)
# ---------------------------------------------------------------------------

def sd_vae_checkpoint_schema(bo=(128, 256, 512, 512), latent=4):
    sch = {}

    def add(k, *shape):
        sch[k] = tuple(shape)

    def resnet(prefix, in_ch, ch):
        add(f"{prefix}.norm1.weight", in_ch)
        add(f"{prefix}.norm1.bias", in_ch)
        add(f"{prefix}.conv1.weight", ch, in_ch, 3, 3)
        add(f"{prefix}.conv1.bias", ch)
        add(f"{prefix}.norm2.weight", ch)
        add(f"{prefix}.norm2.bias", ch)
        add(f"{prefix}.conv2.weight", ch, ch, 3, 3)
        add(f"{prefix}.conv2.bias", ch)
        if in_ch != ch:
            add(f"{prefix}.conv_shortcut.weight", ch, in_ch, 1, 1)
            add(f"{prefix}.conv_shortcut.bias", ch)

    def mid(prefix, ch):
        resnet(f"{prefix}.mid_block.resnets.0", ch, ch)
        a = f"{prefix}.mid_block.attentions.0"
        add(f"{a}.group_norm.weight", ch)
        add(f"{a}.group_norm.bias", ch)
        for p in ("to_q", "to_k", "to_v"):
            add(f"{a}.{p}.weight", ch, ch)
            add(f"{a}.{p}.bias", ch)
        add(f"{a}.to_out.0.weight", ch, ch)
        add(f"{a}.to_out.0.bias", ch)
        resnet(f"{prefix}.mid_block.resnets.1", ch, ch)

    # encoder: 2 resnets/block, downsample after blocks 0..2
    add("encoder.conv_in.weight", bo[0], 3, 3, 3)
    add("encoder.conv_in.bias", bo[0])
    in_ch = bo[0]
    for b, ch in enumerate(bo):
        for li in range(2):
            resnet(f"encoder.down_blocks.{b}.resnets.{li}", in_ch, ch)
            in_ch = ch
        if b < len(bo) - 1:
            add(f"encoder.down_blocks.{b}.downsamplers.0.conv.weight",
                ch, ch, 3, 3)
            add(f"encoder.down_blocks.{b}.downsamplers.0.conv.bias", ch)
    mid("encoder", bo[-1])
    add("encoder.conv_norm_out.weight", bo[-1])
    add("encoder.conv_norm_out.bias", bo[-1])
    add("encoder.conv_out.weight", 2 * latent, bo[-1], 3, 3)
    add("encoder.conv_out.bias", 2 * latent)

    add("quant_conv.weight", 2 * latent, 2 * latent, 1, 1)
    add("quant_conv.bias", 2 * latent)
    add("post_quant_conv.weight", latent, latent, 1, 1)
    add("post_quant_conv.bias", latent)

    # decoder: 3 resnets/block over reversed channels, upsample after 0..2
    add("decoder.conv_in.weight", bo[-1], latent, 3, 3)
    add("decoder.conv_in.bias", bo[-1])
    mid("decoder", bo[-1])
    prev = bo[-1]
    rev = list(reversed(bo))
    for b, ch in enumerate(rev):
        for li in range(3):
            resnet(f"decoder.up_blocks.{b}.resnets.{li}", prev, ch)
            prev = ch
        if b < len(rev) - 1:
            add(f"decoder.up_blocks.{b}.upsamplers.0.conv.weight",
                ch, ch, 3, 3)
            add(f"decoder.up_blocks.{b}.upsamplers.0.conv.bias", ch)
    add("decoder.conv_norm_out.weight", bo[0])
    add("decoder.conv_norm_out.bias", bo[0])
    add("decoder.conv_out.weight", 3, bo[0], 3, 3)
    add("decoder.conv_out.bias", 3)
    return sch


# ---------------------------------------------------------------------------
# CLIP ViT-L/14 vision tower with projection (transformers layout)
# ---------------------------------------------------------------------------

def clip_vit_l14_checkpoint_schema(hidden=1024, layers=24, mlp=4096,
                                   patch=14, image=224, proj=768):
    vm = "vision_model"
    n_pos = (image // patch) ** 2 + 1      # 257 = 16² patches + CLS
    sch = {}

    def add(k, *shape):
        sch[k] = tuple(shape)

    add(f"{vm}.embeddings.class_embedding", hidden)
    add(f"{vm}.embeddings.patch_embedding.weight", hidden, 3, patch, patch)
    add(f"{vm}.embeddings.position_embedding.weight", n_pos, hidden)
    # NOTE: "pre_layrnorm" is the actual (misspelled) HF transformers key
    add(f"{vm}.pre_layrnorm.weight", hidden)
    add(f"{vm}.pre_layrnorm.bias", hidden)
    for i in range(layers):
        base = f"{vm}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            add(f"{base}.{ln}.weight", hidden)
            add(f"{base}.{ln}.bias", hidden)
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add(f"{base}.self_attn.{p}.weight", hidden, hidden)
            add(f"{base}.self_attn.{p}.bias", hidden)
        add(f"{base}.mlp.fc1.weight", mlp, hidden)
        add(f"{base}.mlp.fc1.bias", mlp)
        add(f"{base}.mlp.fc2.weight", hidden, mlp)
        add(f"{base}.mlp.fc2.bias", hidden)
    add(f"{vm}.post_layernorm.weight", hidden)
    add(f"{vm}.post_layernorm.bias", hidden)
    add("visual_projection.weight", proj, hidden)   # no bias in CLIP
    return sch


def _mapped_torch_shapes(shapes, mapper):
    """flax shape tree → {diffusers key: torch shape} via the port's own
    mapper + the inverse transform (stride-0 views keep this allocation-free)."""
    got = {}
    for path, leaf in tu.flatten_dict(shapes).items():
        m = mapper(tuple(path))
        assert m is not None, f"unmapped flax path {path}"
        dummy = np.broadcast_to(np.zeros((), np.int8), leaf.shape)
        got[m[0]] = _invert(m[1], dummy).shape
    return got


def _assert_schema_match(got, schema, what):
    missing = sorted(set(schema) - set(got))
    assert not missing, f"{what}: model/port misses {len(missing)} keys, " \
                        f"e.g. {missing[:8]}"
    unexpected = sorted(set(got) - set(schema))
    assert not unexpected, f"{what}: port emits {len(unexpected)} keys no " \
                           f"real checkpoint has, e.g. {unexpected[:8]}"
    bad = [(k, got[k], schema[k]) for k in schema if got[k] != schema[k]]
    assert not bad, f"{what}: shape mismatches {bad[:6]}"


def test_vae_port_covers_full_sd_checkpoint():
    from drawingspinup_tpu.models.vae import AutoencoderKL
    from drawingspinup_tpu.utils.diffusers_port import map_vae_key

    vae = AutoencoderKL()
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    got = _mapped_torch_shapes(shapes, map_vae_key)
    _assert_schema_match(got, sd_vae_checkpoint_schema(), "SD VAE")


def test_clip_port_covers_full_vit_l14_checkpoint():
    from drawingspinup_tpu.models.clip_vision import (
        CLIPVisionModelWithProjection,
    )
    from drawingspinup_tpu.utils.diffusers_port import map_clip_key

    clip = CLIPVisionModelWithProjection()
    shapes = jax.eval_shape(clip.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))["params"]
    got = _mapped_torch_shapes(shapes, map_clip_key)
    _assert_schema_match(got, clip_vit_l14_checkpoint_schema(), "CLIP ViT-L/14")
