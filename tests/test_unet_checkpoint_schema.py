"""Checkpoint-coverage test for the Wonder3D UNet port (VERDICT r1 weak #4).

The round-1 tests proved the flax→diffusers key mapping is total over OUR
tree — but the tree itself could be structurally wrong and nothing would
fail until real weights arrive. This test hand-codes the EXPECTED
SD-1.5 UNet checkpoint schema (key names + tensor shapes) from the public
architecture — block plan (CrossAttnDown ×3 + Down, mid, mirrored ups),
channel plan (320, 640, 1280, 1280), skip-channel bookkeeping, Transformer2D
layout — independent of this repo's model code, with the Wonder3D deltas
(8-channel conv_in, 10-dim projection class embedding,
reference unet_mv2d_condition.py:176-625). It then asserts that mapping our
SD-scale tree covers EXACTLY that key set with EXACTLY those shapes.

If our UNet drops a block, mis-sizes a layer, or the mapper emits a wrong
diffusers name, this fails — offline, without Wonder3D weights.
"""
from __future__ import annotations

import numpy as np
import pytest


def sd15_unet_checkpoint_schema(in_channels=8, out_channels=4,
                                class_dim=10, cross=768):
    """{diffusers key: torch shape} for the SD-1.5 UNet2DConditionModel
    (Wonder3D variant). Public architecture facts only."""
    bo = (320, 640, 1280, 1280)
    temb = bo[0] * 4
    sch = {}

    def add(k, *shape):
        sch[k] = tuple(shape)

    def resnet(prefix, in_ch, ch):
        add(f"{prefix}.norm1.weight", in_ch)
        add(f"{prefix}.norm1.bias", in_ch)
        add(f"{prefix}.conv1.weight", ch, in_ch, 3, 3)
        add(f"{prefix}.conv1.bias", ch)
        add(f"{prefix}.time_emb_proj.weight", ch, temb)
        add(f"{prefix}.time_emb_proj.bias", ch)
        add(f"{prefix}.norm2.weight", ch)
        add(f"{prefix}.norm2.bias", ch)
        add(f"{prefix}.conv2.weight", ch, ch, 3, 3)
        add(f"{prefix}.conv2.bias", ch)
        if in_ch != ch:
            add(f"{prefix}.conv_shortcut.weight", ch, in_ch, 1, 1)
            add(f"{prefix}.conv_shortcut.bias", ch)

    def attention(prefix, ch):
        add(f"{prefix}.norm.weight", ch)
        add(f"{prefix}.norm.bias", ch)
        add(f"{prefix}.proj_in.weight", ch, ch, 1, 1)
        add(f"{prefix}.proj_in.bias", ch)
        tb = f"{prefix}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            add(f"{tb}.{n}.weight", ch)
            add(f"{tb}.{n}.bias", ch)
        for qkv in ("to_q", "to_k", "to_v"):
            add(f"{tb}.attn1.{qkv}.weight", ch, ch)
        add(f"{tb}.attn1.to_out.0.weight", ch, ch)
        add(f"{tb}.attn1.to_out.0.bias", ch)
        add(f"{tb}.attn2.to_q.weight", ch, ch)
        add(f"{tb}.attn2.to_k.weight", ch, cross)
        add(f"{tb}.attn2.to_v.weight", ch, cross)
        add(f"{tb}.attn2.to_out.0.weight", ch, ch)
        add(f"{tb}.attn2.to_out.0.bias", ch)
        # GEGLU feed-forward: net.0.proj doubles the inner dim
        add(f"{tb}.ff.net.0.proj.weight", ch * 8, ch)
        add(f"{tb}.ff.net.0.proj.bias", ch * 8)
        add(f"{tb}.ff.net.2.weight", ch, ch * 4)
        add(f"{tb}.ff.net.2.bias", ch)
        add(f"{prefix}.proj_out.weight", ch, ch, 1, 1)
        add(f"{prefix}.proj_out.bias", ch)

    add("conv_in.weight", bo[0], in_channels, 3, 3)
    add("conv_in.bias", bo[0])
    add("time_embedding.linear_1.weight", temb, bo[0])
    add("time_embedding.linear_1.bias", temb)
    add("time_embedding.linear_2.weight", temb, temb)
    add("time_embedding.linear_2.bias", temb)
    add("class_embedding.linear_1.weight", temb, class_dim)
    add("class_embedding.linear_1.bias", temb)
    add("class_embedding.linear_2.weight", temb, temb)
    add("class_embedding.linear_2.bias", temb)

    skips = [bo[0]]                     # conv_in output
    in_ch = bo[0]
    for b, ch in enumerate(bo):
        final = b == len(bo) - 1
        for li in range(2):
            resnet(f"down_blocks.{b}.resnets.{li}", in_ch, ch)
            in_ch = ch
            if not final:
                attention(f"down_blocks.{b}.attentions.{li}", ch)
            skips.append(ch)
        if not final:
            add(f"down_blocks.{b}.downsamplers.0.conv.weight", ch, ch, 3, 3)
            add(f"down_blocks.{b}.downsamplers.0.conv.bias", ch)
            skips.append(ch)

    resnet("mid_block.resnets.0", bo[-1], bo[-1])
    attention("mid_block.attentions.0", bo[-1])
    resnet("mid_block.resnets.1", bo[-1], bo[-1])

    prev = bo[-1]
    rev = list(reversed(bo))
    for b, ch in enumerate(rev):
        first = b == 0
        for li in range(3):
            skip = skips.pop()
            resnet(f"up_blocks.{b}.resnets.{li}", prev + skip, ch)
            prev = ch
            if not first:
                attention(f"up_blocks.{b}.attentions.{li}", ch)
        if b < len(rev) - 1:
            add(f"up_blocks.{b}.upsamplers.0.conv.weight", ch, ch, 3, 3)
            add(f"up_blocks.{b}.upsamplers.0.conv.bias", ch)

    add("conv_norm_out.weight", bo[0])
    add("conv_norm_out.bias", bo[0])
    add("conv_out.weight", out_channels, bo[0], 3, 3)
    add("conv_out.bias", out_channels)
    return sch


def _torch_shape_for(path, flax_shape, key):
    """Invert the port transform: expected torch-side shape for a flax leaf."""
    base = key.rsplit(".", 1)[0]
    if base.endswith("proj_in") or base.endswith("proj_out"):
        if key.endswith(".weight"):
            return (flax_shape[1], flax_shape[0], 1, 1)   # 1×1 conv
        return tuple(flax_shape)
    if len(flax_shape) == 4:                              # conv HWIO → OIHW
        return (flax_shape[3], flax_shape[2], flax_shape[0], flax_shape[1])
    if len(flax_shape) == 2 and key.endswith(".weight"):  # dense (in,out)→
        return (flax_shape[1], flax_shape[0])
    return tuple(flax_shape)


def test_unet_port_covers_full_sd15_checkpoint():
    import flax.traverse_util as tu
    import jax
    import jax.numpy as jnp

    from drawingspinup_tpu.models.unet_mv2d import UNetMV2D, UNetMVConfig
    from drawingspinup_tpu.utils.diffusers_port import map_unet_key

    cfg = UNetMVConfig()  # full SD scale
    unet = UNetMV2D(cfg)
    # eval_shape: the SD-scale tree's SHAPES without materializing ~860M
    # params on the test CPU
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((12, 32, 32, 8)),
        jnp.zeros((12,), jnp.int32), jnp.zeros((12, 1, 768)),
        jnp.zeros((12, 10)))["params"]

    schema = sd15_unet_checkpoint_schema()
    got = {}
    extras = []
    for path, leaf in tu.flatten_dict(shapes).items():
        m = map_unet_key(tuple(path))
        assert m is not None, f"unmapped flax path {path}"
        key = m[0]
        if ".attn_joint" in key or ".norm_joint" in key:
            extras.append(key)        # Wonder3D additions, zero-init — a
            continue                  # base SD ckpt legitimately lacks them
        got[key] = _torch_shape_for(path, leaf.shape, key)

    missing = sorted(set(schema) - set(got))
    assert not missing, f"model/port misses {len(missing)} SD-1.5 keys, " \
                        f"e.g. {missing[:8]}"
    unexpected = sorted(set(got) - set(schema))
    assert not unexpected, f"port emits {len(unexpected)} keys no SD-1.5 " \
                           f"checkpoint has, e.g. {unexpected[:8]}"
    bad = [(k, got[k], schema[k]) for k in schema if got[k] != schema[k]]
    assert not bad, f"shape mismatches: {bad[:6]}"
    # the Wonder3D joint-attention extras exist (mvcd mid attention)
    assert extras, "expected attn_joint parameters in the MV mid block"
