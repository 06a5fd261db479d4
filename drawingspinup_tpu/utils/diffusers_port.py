"""Port diffusers-format (torch) Wonder3D checkpoints into the flax trees.

The reference loads ``flamehaze1115/wonder3d-v1.0`` through diffusers
(``mv.py:29-39``); its UNet loader additionally renames the joint-attention
blocks and zero-pads conv_in for the extra latent channels
(``unet_mv2d_condition.py:1318-1351``). Here the checkpoint is a local
directory with ``unet/ vae/ image_encoder/`` safetensors; each flax leaf path
is translated to its diffusers key and transposed:

  Dense   (in, out) ← torch (out, in).T
  Conv    HWIO      ← torch OIHW (2, 3, 1, 0)
  Norms   scale/bias ← weight/bias

``map_*_key`` are exposed separately so tests can verify the translation is
total over the model trees without the actual weights.
"""
from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def _t_dense(a):
    return np.asarray(a).T


def _t_conv(a):
    return np.asarray(a).transpose(2, 3, 1, 0)


def _t_none(a):
    return np.asarray(a)


# ---------------------------------------------------------------------------
# UNet key mapping
# ---------------------------------------------------------------------------

_ATTN_LEAF = {
    ("to_q", "kernel"): ("to_q.weight", _t_dense),
    ("to_k", "kernel"): ("to_k.weight", _t_dense),
    ("to_v", "kernel"): ("to_v.weight", _t_dense),
    ("to_out", "kernel"): ("to_out.0.weight", _t_dense),
    ("to_out", "bias"): ("to_out.0.bias", _t_none),
}

_RES_LEAF = {
    ("norm1", "scale"): ("norm1.weight", _t_none),
    ("norm1", "bias"): ("norm1.bias", _t_none),
    ("conv1", "kernel"): ("conv1.weight", _t_conv),
    ("conv1", "bias"): ("conv1.bias", _t_none),
    ("time_emb_proj", "kernel"): ("time_emb_proj.weight", _t_dense),
    ("time_emb_proj", "bias"): ("time_emb_proj.bias", _t_none),
    ("norm2", "scale"): ("norm2.weight", _t_none),
    ("norm2", "bias"): ("norm2.bias", _t_none),
    ("conv2", "kernel"): ("conv2.weight", _t_conv),
    ("conv2", "bias"): ("conv2.bias", _t_none),
    ("conv_shortcut", "kernel"): ("conv_shortcut.weight", _t_conv),
    ("conv_shortcut", "bias"): ("conv_shortcut.bias", _t_none),
}


def _map_transformer_leaf(rest: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    """Path inside a TransformerMV2D → diffusers suffix."""
    if rest[0] == "norm":
        return (f"norm.{'weight' if rest[1] == 'scale' else 'bias'}", _t_none)
    if rest[0] in ("proj_in", "proj_out"):
        # diffusers uses 1×1 convs here; flax uses Dense ⇒ squeeze spatial
        if rest[1] == "kernel":
            return (f"{rest[0]}.weight",
                    lambda a: np.asarray(a)[:, :, 0, 0].T
                    if np.asarray(a).ndim == 4 else np.asarray(a).T)
        return (f"{rest[0]}.bias", _t_none)
    m = re.fullmatch(r"block(\d+)", rest[0])
    if m:
        tb = f"transformer_blocks.{m.group(1)}"
        inner = rest[1:]
        if inner[0].startswith("attn") or inner[0].startswith("attn_joint"):
            leaf = _ATTN_LEAF.get((inner[1], inner[2]))
            if leaf:
                return (f"{tb}.{inner[0]}.{leaf[0]}", leaf[1])
        if inner[0].startswith("norm"):
            w = "weight" if inner[1] == "scale" else "bias"
            return (f"{tb}.{inner[0]}.{w}", _t_none)
        if inner[0] == "ff":
            if inner[1] == "proj_in":
                return (f"{tb}.ff.net.0.proj."
                        f"{'weight' if inner[2] == 'kernel' else 'bias'}",
                        _t_dense if inner[2] == "kernel" else _t_none)
            return (f"{tb}.ff.net.2."
                    f"{'weight' if inner[2] == 'kernel' else 'bias'}",
                    _t_dense if inner[2] == "kernel" else _t_none)
    return None


def map_unet_key(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    """flax param path → (diffusers key, transform) for UNetMV2D."""
    head = path[0]
    if head in ("conv_in", "conv_out"):
        return (f"{head}.{'weight' if path[1] == 'kernel' else 'bias'}",
                _t_conv if path[1] == "kernel" else _t_none)
    if head == "conv_norm_out":
        return (f"conv_norm_out.{'weight' if path[1] == 'scale' else 'bias'}",
                _t_none)
    if head in ("time_embedding", "class_embedding"):
        return (f"{head}.{path[1]}."
                f"{'weight' if path[2] == 'kernel' else 'bias'}",
                _t_dense if path[2] == "kernel" else _t_none)

    m = re.fullmatch(r"(down|up)(\d+)_(res|attn)(\d+)", head)
    if m:
        side, bi, kind, li = m.group(1), m.group(2), m.group(3), m.group(4)
        base = f"{side}_blocks.{bi}"
        if kind == "res":
            leaf = _RES_LEAF.get((path[1], path[2]))
            if leaf:
                return (f"{base}.resnets.{li}.{leaf[0]}", leaf[1])
        else:
            sub = _map_transformer_leaf(path[1:])
            if sub:
                return (f"{base}.attentions.{li}.{sub[0]}", sub[1])
    m = re.fullmatch(r"down(\d+)_downsample", head)
    if m:
        return (f"down_blocks.{m.group(1)}.downsamplers.0.conv."
                f"{'weight' if path[2] == 'kernel' else 'bias'}",
                _t_conv if path[2] == "kernel" else _t_none)
    m = re.fullmatch(r"up(\d+)_upsample", head)
    if m:
        return (f"up_blocks.{m.group(1)}.upsamplers.0.conv."
                f"{'weight' if path[2] == 'kernel' else 'bias'}",
                _t_conv if path[2] == "kernel" else _t_none)
    m = re.fullmatch(r"mid_res(\d)", head)
    if m:
        leaf = _RES_LEAF.get((path[1], path[2]))
        if leaf:
            return (f"mid_block.resnets.{m.group(1)}.{leaf[0]}", leaf[1])
    if head == "mid_attn":
        sub = _map_transformer_leaf(path[1:])
        if sub:
            return (f"mid_block.attentions.0.{sub[0]}", sub[1])
    return None


# ---------------------------------------------------------------------------
# VAE key mapping
# ---------------------------------------------------------------------------

def map_vae_key(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    head = path[0]
    if head in ("quant_conv", "post_quant_conv"):
        return (f"{head}.{'weight' if path[1] == 'kernel' else 'bias'}",
                _t_conv if path[1] == "kernel" else _t_none)
    if head not in ("encoder", "decoder"):
        return None
    sub = path[1]
    rest = path[2:]
    prefix = head

    def convleaf(key):
        return (f"{prefix}.{key}.{'weight' if rest[-1] == 'kernel' else 'bias'}",
                _t_conv if rest[-1] == "kernel" else _t_none)

    if sub in ("conv_in", "conv_out"):
        return convleaf(sub)
    if sub == "conv_norm_out":
        return (f"{prefix}.conv_norm_out."
                f"{'weight' if rest[-1] == 'scale' else 'bias'}", _t_none)
    m = re.fullmatch(r"(down|up)(\d+)_res(\d+)", sub)
    if m:
        side, bi, li = m.group(1), m.group(2), m.group(3)
        leaf = {("norm1", "scale"): "norm1.weight",
                ("norm1", "bias"): "norm1.bias",
                ("conv1", "kernel"): "conv1.weight",
                ("conv1", "bias"): "conv1.bias",
                ("norm2", "scale"): "norm2.weight",
                ("norm2", "bias"): "norm2.bias",
                ("conv2", "kernel"): "conv2.weight",
                ("conv2", "bias"): "conv2.bias",
                ("conv_shortcut", "kernel"): "conv_shortcut.weight",
                ("conv_shortcut", "bias"): "conv_shortcut.bias"}.get(
            (rest[0], rest[1]))
        if leaf:
            tf = _t_conv if "conv" in rest[0] and rest[1] == "kernel" \
                else _t_none
            return (f"{prefix}.{side}_blocks.{bi}.resnets.{li}.{leaf}", tf)
    m = re.fullmatch(r"down(\d+)_downsample", sub)
    if m:
        return (f"{prefix}.down_blocks.{m.group(1)}.downsamplers.0.conv."
                f"{'weight' if rest[-1] == 'kernel' else 'bias'}",
                _t_conv if rest[-1] == "kernel" else _t_none)
    m = re.fullmatch(r"up(\d+)_upsample", sub)
    if m:
        return (f"{prefix}.up_blocks.{m.group(1)}.upsamplers.0.conv."
                f"{'weight' if rest[-1] == 'kernel' else 'bias'}",
                _t_conv if rest[-1] == "kernel" else _t_none)
    m = re.fullmatch(r"mid_res(\d)", sub)
    if m:
        idx = m.group(1)
        tf = _t_conv if "conv" in rest[0] and rest[1] == "kernel" else _t_none
        leaf = f"{rest[0]}.{'weight' if rest[1] in ('kernel', 'scale') else 'bias'}"
        return (f"{prefix}.mid_block.resnets.{idx}.{leaf}", tf)
    if sub == "mid_attn":
        name = {("group_norm", "scale"): ("group_norm.weight", _t_none),
                ("group_norm", "bias"): ("group_norm.bias", _t_none),
                ("to_q", "kernel"): ("to_q.weight", _t_dense),
                ("to_q", "bias"): ("to_q.bias", _t_none),
                ("to_k", "kernel"): ("to_k.weight", _t_dense),
                ("to_k", "bias"): ("to_k.bias", _t_none),
                ("to_v", "kernel"): ("to_v.weight", _t_dense),
                ("to_v", "bias"): ("to_v.bias", _t_none),
                ("to_out", "kernel"): ("to_out.0.weight", _t_dense),
                ("to_out", "bias"): ("to_out.0.bias", _t_none)}.get(
            (rest[0], rest[1]))
        if name:
            return (f"{prefix}.mid_block.attentions.0.{name[0]}", name[1])
    return None


# ---------------------------------------------------------------------------
# CLIP vision key mapping
# ---------------------------------------------------------------------------

def map_clip_key(path: Tuple[str, ...]) -> Optional[Tuple[str, Callable]]:
    head = path[0]
    vm = "vision_model"
    if head == "patch_embedding":
        return (f"{vm}.embeddings.patch_embedding.weight", _t_conv)
    if head == "class_embedding":
        return (f"{vm}.embeddings.class_embedding", _t_none)
    if head == "position_embedding":
        return (f"{vm}.embeddings.position_embedding.weight", _t_none)
    if head in ("pre_layrnorm", "post_layernorm"):
        return (f"{vm}.{head}.{'weight' if path[1] == 'scale' else 'bias'}",
                _t_none)
    if head == "visual_projection":
        return ("visual_projection.weight", _t_dense)
    m = re.fullmatch(r"layer(\d+)", head)
    if m:
        base = f"{vm}.encoder.layers.{m.group(1)}"
        sub, leaf = path[1], path[2]
        if sub in ("layer_norm1", "layer_norm2"):
            return (f"{base}.{sub}.{'weight' if leaf == 'scale' else 'bias'}",
                    _t_none)
        if sub in ("q_proj", "k_proj", "v_proj", "out_proj"):
            return (f"{base}.self_attn.{sub}."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    _t_dense if leaf == "kernel" else _t_none)
        if sub in ("fc1", "fc2"):
            return (f"{base}.mlp.{sub}."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    _t_dense if leaf == "kernel" else _t_none)
    return None


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def _load_safetensors_dir(d: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(d)):
        if fname.endswith(".safetensors"):
            with safe_open(os.path.join(d, fname), framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
    return out


# Checkpoint-side renames the reference applies before loading
# (unet_mv2d_condition.py:1318-1332): Wonder3D checkpoints store the joint
# blocks under their original training names; the module graph (and our flax
# modules) use the *_last/*_mid names.
_JOINT_RENAMES = (("attn_joint_twice.", "attn_joint_mid."),
                  ("norm_joint_twice.", "norm_joint_mid."),
                  ("attn_joint.", "attn_joint_last."),
                  ("norm_joint.", "norm_joint_last."))


def rename_joint_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """attn_joint.→attn_joint_last. etc. — the *_twice rules must run first
    (attn_joint. is a prefix-substring of attn_joint_twice.)."""
    out = {}
    for k, v in state.items():
        for old, new in _JOINT_RENAMES:
            if old in k:
                k = k.replace(old, new)
                break
        out[k] = v
    return out


# Deprecated VAE attention names (diffusers < 0.15 saved AttentionBlock as
# query/key/value/proj_attn; modern Attention uses to_q/to_k/to_v/to_out.0 —
# the reference runs diffusers' own _convert_deprecated_attention_blocks
# for the UNet and from_pretrained handles the VAE; same conversion here).
_DEPRECATED_ATTN = (("query.", "to_q."), ("key.", "to_k."),
                    ("value.", "to_v."), ("proj_attn.", "to_out.0."))


def convert_deprecated_attention(state: Dict[str, np.ndarray]
                                 ) -> Dict[str, np.ndarray]:
    """Rename old-style attention keys (scoped to ``attentions.`` blocks so
    unrelated keys containing e.g. '.key.' are untouched). Linear weights
    keep their (c, c) shape in both layouts — a pure rename."""
    out = {}
    for k, v in state.items():
        if ".attentions." in k:
            for old, new in _DEPRECATED_ATTN:
                if "." + old in k:
                    k = k.replace("." + old, "." + new)
                    break
        out[k] = v
    return out


def overlay(params: Dict, state: Dict[str, np.ndarray],
            mapper: Callable[[Tuple[str, ...]], Optional[Tuple[str, Callable]]],
            strict: bool = False) -> Tuple[Dict, int, int]:
    """Overlay torch weights onto a flax tree via a key mapper.
    Returns (new tree, matched count, missed count)."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    flat = dict(tu.flatten_dict(params))
    hit = miss = 0
    for path, leaf in list(flat.items()):
        mapped = mapper(tuple(path))
        if mapped and mapped[0] in state:
            val = mapped[1](state[mapped[0]])
            if val.shape != leaf.shape:
                # conv_in zero-padded extra input channels (reference
                # unet_mv2d_condition.py:1345-1351, zero_init_conv_in=True)
                if path[0] == "conv_in" and path[-1] == "kernel" \
                        and val.shape[:2] == leaf.shape[:2] \
                        and val.shape[3] == leaf.shape[3]:
                    pad = np.zeros(leaf.shape, val.dtype)
                    pad[:, :, : val.shape[2]] = val
                    val = pad
                # conv_out 4→8 output channels: copy SD's 4 into both halves
                # (unet_mv2d_condition.py:1353-1358, out_channels == 8; the
                # reference copies only the weight — a mismatched bias stays
                # at model init via ignore_mismatched_sizes)
                elif path[0] == "conv_out" and path[-1] == "kernel" \
                        and val.shape[-1] * 2 == leaf.shape[-1] \
                        and val.shape[:-1] == leaf.shape[:-1]:
                    val = np.concatenate([val, val], axis=-1)
                else:
                    miss += 1
                    continue
            # fp16-variant checkpoints land at the tree's dtype (the compute
            # dtype is applied per-op at apply time, not baked into params)
            flat[path] = jnp.asarray(val, dtype=leaf.dtype)
            hit += 1
        else:
            miss += 1
            if strict:
                raise KeyError(f"no mapping for {path} → {mapped}")
    return tu.unflatten_dict(flat), hit, miss


def load_wonder3d_params(ckpt_dir: str, params: Dict) -> Dict:
    """Overlay a diffusers-layout checkpoint dir onto pipeline params."""
    out = dict(params)
    for part, mapper in (("unet", map_unet_key), ("vae", map_vae_key),
                         ("image_encoder", map_clip_key)):
        sub = os.path.join(ckpt_dir, part)
        key = "clip" if part == "image_encoder" else part
        if os.path.isdir(sub) and key in out:
            state = _load_safetensors_dir(sub)
            if part == "unet":
                state = rename_joint_keys(state)
            if part in ("unet", "vae"):
                state = convert_deprecated_attention(state)
            out[key], hit, miss = overlay(out[key], state, mapper)
            print(f"[wonder3d port] {part}: {hit} loaded, {miss} unmapped")
    return out
