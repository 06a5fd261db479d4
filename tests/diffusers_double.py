"""Faithful torch reconstruction of the diffusers-0.19.3 sub-API that the
reference mvdiffusion modules import — enough to EXECUTE the reference's own
``UNetMV2DConditionModel`` / ``TransformerMV2DModel`` forwards offline
(VERDICT r3 item #1: executed forward-parity oracles for stage 2a).

Scope discipline (same policy as reference_oracle.py): the reference's own
2,400 LoC (`mvdiffusion/models/unet_mv2d_condition.py`, `unet_mv2d_blocks.py`,
`transformer_mv2d.py`) are imported and executed VERBATIM; only the stock SD
building blocks they import from diffusers are reconstructed here at their
public 0.19.3 contracts (state-dict key layout included, so SD checkpoints
and our utils/diffusers_port.py mapping see the real key names):

  ResnetBlock2D / Downsample2D / Upsample2D        (models/resnet.py)
  DownBlock2D / UpBlock2D                          (models/unet_2d_blocks.py)
  Attention (+AttnProcessor/XFormersAttnProcessor) (models/attention_processor.py)
  FeedForward / GEGLU                              (models/attention.py)
  Timesteps / TimestepEmbedding                    (models/embeddings.py)
  get_activation                                   (models/activations.py)
  ConfigMixin / register_to_config / ModelMixin / BaseOutput and misc utils

xformers' ``memory_efficient_attention`` is doubled as exact softmax
attention (its public contract), matching the double already used by the
attention-processor oracles in test_reference_parity.py. Everything on the
hub/loader path (DIFFUSERS_CACHE, _get_model_file, ...) is a stub — the
oracles random-initialize and port state_dicts; they never load from disk.

Also hosts ``DDIMSchedulerDouble`` (diffusers 0.19.3 schedulers/
scheduling_ddim.py semantics: leading spacing, steps_offset, eta variance)
and ``AutoencoderKLDouble`` (stock SD VAE topology the Wonder3D pipeline
calls through ``vae.encode(...).latent_dist.mode()`` / ``vae.decode``),
used by the DDIM and VAE oracles.
"""
from __future__ import annotations

import dataclasses
import functools
import inspect
import math
import sys
import types
from collections import OrderedDict
from typing import Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# configuration_utils / modeling_utils / utils
# ---------------------------------------------------------------------------


def _module(name: str) -> types.ModuleType:
    """Stub module with a real ModuleSpec — a None __spec__ makes any later
    importlib.util.find_spec(name) in the process raise ValueError (e.g.
    transformers probing for xformers)."""
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

class FrozenDict(OrderedDict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


class ConfigMixin:
    config_name = "config.json"

    def register_to_config(self, **kwargs):
        d = getattr(self, "_internal_dict", None) or {}
        d = dict(d)
        d.update(kwargs)
        self._internal_dict = FrozenDict(d)

    @property
    def config(self):
        return getattr(self, "_internal_dict", FrozenDict())


def register_to_config(init):
    """Capture the full (defaults-applied) init signature into self.config
    before running the init body — diffusers' decorator contract; the
    reference reads e.g. ``self.config.class_embed_type`` in forward."""

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k not in ("self", "args", "kwargs")}
        self._internal_dict = FrozenDict(cfg)
        init(self, *args, **kwargs)

    return wrapper


class ModelMixin(nn.Module):
    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device

    def enable_xformers_memory_efficient_attention(self, attention_op=None):
        for m in self.modules():
            if m is not self and hasattr(
                    m, "set_use_memory_efficient_attention_xformers"):
                m.set_use_memory_efficient_attention_xformers(True)


class BaseOutput(OrderedDict):
    """dataclass+dict hybrid; only attribute access is exercised."""

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is not None:
                self[f.name] = v

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return super().__getitem__(k)


class _Logging(types.ModuleType):
    def get_logger(self, name=None):
        import logging as _l
        lg = _l.getLogger(name or "diffusers_double")
        if not hasattr(lg, "warn"):
            lg.warn = lg.warning
        return lg


def deprecate(*args, **kwargs):
    return None


def maybe_allow_in_graph(cls):
    return cls


def is_torch_version(op, ver):
    from packaging import version
    cur = version.parse(torch.__version__.split("+")[0])
    ref = version.parse(ver)
    return {"==": cur == ref, ">=": cur >= ref, "<=": cur <= ref,
            ">": cur > ref, "<": cur < ref}[op]


def _unused(*a, **k):
    raise NotImplementedError("diffusers double: hub/loader path not available")


# ---------------------------------------------------------------------------
# activations / embeddings
# ---------------------------------------------------------------------------

def get_activation(act_fn: str) -> nn.Module:
    if act_fn in ("silu", "swish"):
        return nn.SiLU()
    if act_fn == "mish":
        return nn.Mish()
    if act_fn == "gelu":
        return nn.GELU()
    if act_fn == "relu":
        return nn.ReLU()
    raise ValueError(f"Unsupported activation function: {act_fn}")


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1.0, scale=1.0,
                           max_period=10000):
    """diffusers models/embeddings.py:get_timestep_embedding, verbatim math."""
    assert len(timesteps.shape) == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        start=0, end=half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.cond_proj = (nn.Linear(cond_proj_dim, in_channels, bias=False)
                          if cond_proj_dim is not None else None)
        self.act = get_activation(act_fn)
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)
        self.post_act = (get_activation(post_act_fn)
                         if post_act_fn is not None else None)

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        sample = self.linear_1(sample)
        if self.act is not None:
            sample = self.act(sample)
        sample = self.linear_2(sample)
        if self.post_act is not None:
            sample = self.post_act(sample)
        return sample


# ---------------------------------------------------------------------------
# resnet blocks
# ---------------------------------------------------------------------------

class Downsample2D(nn.Module):
    """stride-2 3×3 conv (use_conv path; state key ``conv``)."""

    def __init__(self, channels, use_conv=False, out_channels=None,
                 padding=1, name="conv"):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.padding = padding
        if use_conv:
            self.conv = nn.Conv2d(self.channels, self.out_channels, 3,
                                  stride=2, padding=padding)
        else:
            assert self.channels == self.out_channels
            self.conv = nn.AvgPool2d(kernel_size=2, stride=2)

    def forward(self, hidden_states):
        if self.padding == 0 and isinstance(self.conv, nn.Conv2d):
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1),
                                  mode="constant", value=0)
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    """nearest ×2 then 3×3 conv (use_conv path; state key ``conv``)."""

    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.conv = (nn.Conv2d(self.channels, self.out_channels, 3, padding=1)
                     if use_conv else None)

    def forward(self, hidden_states, output_size=None):
        if output_size is None:
            hidden_states = F.interpolate(hidden_states, scale_factor=2.0,
                                          mode="nearest")
        else:
            hidden_states = F.interpolate(hidden_states, size=output_size,
                                          mode="nearest")
        if self.conv is not None:
            hidden_states = self.conv(hidden_states)
        return hidden_states


class ResnetBlock2D(nn.Module):
    """diffusers models/resnet.py ResnetBlock2D, 'default' time norm path."""

    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 skip_time_act=False, time_embedding_norm="default",
                 kernel=None, output_scale_factor=1.0, use_in_shortcut=None,
                 up=False, down=False, conv_shortcut_bias=True,
                 conv_2d_out_channels=None):
        super().__init__()
        assert not up and not down and kernel is None
        assert time_embedding_norm in ("default", "scale_shift")
        self.in_channels = in_channels
        out_channels = in_channels if out_channels is None else out_channels
        self.out_channels = out_channels
        self.time_embedding_norm = time_embedding_norm
        self.output_scale_factor = output_scale_factor
        self.skip_time_act = skip_time_act
        groups_out = groups_out or groups

        self.norm1 = nn.GroupNorm(num_groups=groups, num_channels=in_channels,
                                  eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, stride=1,
                               padding=1)
        if temb_channels is not None:
            if time_embedding_norm == "default":
                self.time_emb_proj = nn.Linear(temb_channels, out_channels)
            else:
                self.time_emb_proj = nn.Linear(temb_channels,
                                               2 * out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(num_groups=groups_out,
                                  num_channels=out_channels, eps=eps,
                                  affine=True)
        self.dropout = nn.Dropout(dropout)
        conv_2d_out_channels = conv_2d_out_channels or out_channels
        self.conv2 = nn.Conv2d(out_channels, conv_2d_out_channels, 3,
                               stride=1, padding=1)
        self.nonlinearity = get_activation(non_linearity)
        self.use_in_shortcut = (in_channels != conv_2d_out_channels
                                if use_in_shortcut is None else use_in_shortcut)
        self.conv_shortcut = (
            nn.Conv2d(in_channels, conv_2d_out_channels, 1, stride=1,
                      padding=0, bias=conv_shortcut_bias)
            if self.use_in_shortcut else None)

    def forward(self, input_tensor, temb):
        hidden_states = input_tensor
        hidden_states = self.norm1(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)

        if self.time_emb_proj is not None:
            if not self.skip_time_act:
                temb = self.nonlinearity(temb)
            temb = self.time_emb_proj(temb)[:, :, None, None]
        if temb is not None and self.time_embedding_norm == "default":
            hidden_states = hidden_states + temb

        hidden_states = self.norm2(hidden_states)
        if temb is not None and self.time_embedding_norm == "scale_shift":
            scale, shift = torch.chunk(temb, 2, dim=1)
            hidden_states = hidden_states * (1 + scale) + shift
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)

        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden_states) / self.output_scale_factor


# ---------------------------------------------------------------------------
# attention / feed-forward
# ---------------------------------------------------------------------------

class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out or dim
        assert activation_fn == "geglu", activation_fn
        self.net = nn.ModuleList([GEGLU(dim, inner_dim), nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out)])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class AttnProcessor:
    """Stock softmax-attention processor (0.19.3 AttnProcessor)."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, h, w = hidden_states.shape
            hidden_states = hidden_states.view(b, c, h * w).transpose(1, 2)
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        attention_mask = attn.prepare_attention_mask(
            attention_mask, sequence_length, batch_size)
        if attn.group_norm is not None:
            hidden_states = attn.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        elif attn.norm_cross:
            encoder_hidden_states = attn.norm_encoder_hidden_states(
                encoder_hidden_states)
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        query = attn.head_to_batch_dim(query)
        key = attn.head_to_batch_dim(key)
        value = attn.head_to_batch_dim(value)
        attention_probs = attn.get_attention_scores(query, key, attention_mask)
        hidden_states = torch.bmm(attention_probs, value)
        hidden_states = attn.batch_to_head_dim(hidden_states)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(b, c, h, w)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


class XFormersAttnProcessor:
    """Stock processor routed through the doubled xformers op."""

    def __init__(self, attention_op=None):
        self.attention_op = attention_op

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, h, w = hidden_states.shape
            hidden_states = hidden_states.view(b, c, h * w).transpose(1, 2)
        batch_size, key_tokens, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        attention_mask = attn.prepare_attention_mask(
            attention_mask, key_tokens, batch_size)
        if attn.group_norm is not None:
            hidden_states = attn.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        elif attn.norm_cross:
            encoder_hidden_states = attn.norm_encoder_hidden_states(
                encoder_hidden_states)
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        query = attn.head_to_batch_dim(query).contiguous()
        key = attn.head_to_batch_dim(key).contiguous()
        value = attn.head_to_batch_dim(value).contiguous()
        hidden_states = memory_efficient_attention(
            query, key, value, attn_bias=attention_mask)
        hidden_states = attn.batch_to_head_dim(hidden_states)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(b, c, h, w)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


class Attention(nn.Module):
    """models/attention_processor.py Attention at its 0.19.3 public contract
    (q/k/v/out projections, head fold/unfold, bmm-softmax scores, processor
    dispatch with kwargs pass-through)."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False, cross_attention_norm=None,
                 cross_attention_norm_num_groups=32, added_kv_proj_dim=None,
                 norm_num_groups=None, spatial_norm_dim=None, out_bias=True,
                 scale_qk=True, only_cross_attention=False, eps=1e-5,
                 rescale_output_factor=1.0, residual_connection=False,
                 _from_deprecated_attn_block=False, processor=None):
        super().__init__()
        inner_dim = dim_head * heads
        cross_attention_dim = (cross_attention_dim
                               if cross_attention_dim is not None
                               else query_dim)
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.scale = dim_head ** -0.5 if scale_qk else 1.0
        self.heads = heads
        self.spatial_norm = None
        self.group_norm = (nn.GroupNorm(num_channels=query_dim,
                                        num_groups=norm_num_groups, eps=eps,
                                        affine=True)
                           if norm_num_groups is not None else None)
        assert cross_attention_norm is None
        self.norm_cross = None
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim,
                                               bias=out_bias),
                                     nn.Dropout(dropout)])
        self.set_processor(processor if processor is not None
                           else AttnProcessor())

    def set_processor(self, processor):
        self.processor = processor

    def set_use_memory_efficient_attention_xformers(
            self, use_memory_efficient_attention_xformers: bool = True,
            *args, **kwargs):
        if use_memory_efficient_attention_xformers:
            self.set_processor(XFormersAttnProcessor())

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size=None, out_dim=3):
        if attention_mask is None:
            return attention_mask
        raise NotImplementedError("double: attention masks unused by oracles")

    def head_to_batch_dim(self, tensor, out_dim=3):
        head_size = self.heads
        batch_size, seq_len, dim = tensor.shape
        tensor = tensor.reshape(batch_size, seq_len, head_size,
                                dim // head_size)
        tensor = tensor.permute(0, 2, 1, 3)
        if out_dim == 3:
            tensor = tensor.reshape(batch_size * head_size, seq_len,
                                    dim // head_size)
        return tensor

    def batch_to_head_dim(self, tensor):
        head_size = self.heads
        batch_size, seq_len, dim = tensor.shape
        tensor = tensor.reshape(batch_size // head_size, head_size, seq_len,
                                dim)
        tensor = tensor.permute(0, 2, 1, 3).reshape(
            batch_size // head_size, seq_len, dim * head_size)
        return tensor

    def get_attention_scores(self, query, key, attention_mask=None):
        dtype = query.dtype
        if self.upcast_attention:
            query = query.float()
            key = key.float()
        assert attention_mask is None
        attention_scores = torch.bmm(query, key.transpose(-1, -2)) * self.scale
        if self.upcast_softmax:
            attention_scores = attention_scores.float()
        attention_probs = attention_scores.softmax(dim=-1)
        return attention_probs.to(dtype)

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask,
                              **cross_attention_kwargs)


def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
    """xformers.ops.memory_efficient_attention public contract: exact
    softmax(q kᵀ/√d + bias) v over (B·H, S, D) tensors."""
    scale = q.shape[-1] ** -0.5
    scores = q @ k.transpose(-1, -2) * scale
    if attn_bias is not None:
        scores = scores + attn_bias
    return torch.softmax(scores, dim=-1) @ v


# ---------------------------------------------------------------------------
# stock 2D UNet blocks (only DownBlock2D/UpBlock2D are instantiated at the
# Wonder3D block layout; the other imported names are placeholders)
# ---------------------------------------------------------------------------

class DownBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, dropout=0.0,
                 num_layers=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, resnet_pre_norm=True,
                 output_scale_factor=1.0, add_downsample=True,
                 downsample_padding=1):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=in_ch, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups, dropout=dropout,
                time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor,
                pre_norm=resnet_pre_norm))
        self.resnets = nn.ModuleList(resnets)
        self.downsamplers = (nn.ModuleList([Downsample2D(
            out_channels, use_conv=True, out_channels=out_channels,
            padding=downsample_padding, name="op")])
            if add_downsample else None)

    def forward(self, hidden_states, temb=None):
        output_states = ()
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb)
            output_states = output_states + (hidden_states,)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class UpBlock2D(nn.Module):
    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, dropout=0.0, num_layers=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, resnet_pre_norm=True,
                 output_scale_factor=1.0, add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = (in_channels if i == num_layers - 1
                                 else out_channels)
            resnet_in_channels = (prev_output_channel if i == 0
                                  else out_channels)
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=out_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups, dropout=dropout,
                time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor,
                pre_norm=resnet_pre_norm))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = (nn.ModuleList([Upsample2D(
            out_channels, use_conv=True, out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states, res_hidden_states_tuple, temb=None,
                upsample_size=None):
        for resnet in self.resnets:
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states],
                                      dim=1)
            hidden_states = resnet(hidden_states, temb)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states, upsample_size)
        return hidden_states


class _Placeholder:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "diffusers double: block type not used by the Wonder3D layout")


_PLACEHOLDER_BLOCKS = [
    "ResnetDownsampleBlock2D", "AttnDownBlock2D", "CrossAttnDownBlock2D",
    "SimpleCrossAttnDownBlock2D", "SkipDownBlock2D", "AttnSkipDownBlock2D",
    "DownEncoderBlock2D", "AttnDownEncoderBlock2D", "KDownBlock2D",
    "KCrossAttnDownBlock2D", "ResnetUpsampleBlock2D", "CrossAttnUpBlock2D",
    "SimpleCrossAttnUpBlock2D", "AttnUpBlock2D", "SkipUpBlock2D",
    "AttnSkipUpBlock2D", "UpDecoderBlock2D", "AttnUpDecoderBlock2D",
    "KUpBlock2D", "KCrossAttnUpBlock2D", "UNetMidBlock2DCrossAttn",
    "UNetMidBlock2DSimpleCrossAttn",
]

_PLACEHOLDER_EMBEDDINGS = [
    "GaussianFourierProjection", "ImageHintTimeEmbedding", "ImageProjection",
    "ImageTimeEmbedding", "TextImageProjection", "TextImageTimeEmbedding",
    "TextTimeEmbedding", "ImagePositionalEmbeddings", "PatchEmbed",
]


# ---------------------------------------------------------------------------
# DDIM scheduler double (schedulers/scheduling_ddim.py, 0.19.3 semantics)
# ---------------------------------------------------------------------------

class DDIMSchedulerDouble:
    """set_timesteps (leading spacing + steps_offset) and step (eta variance,
    epsilon/v_prediction/sample, clip/threshold off) — the exact code path
    the reference pipeline drives (pipeline_mvdiffusion_image.py:478-486)."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, beta_schedule="scaled_linear",
                 clip_sample=False, set_alpha_to_one=False, steps_offset=1,
                 prediction_type="epsilon"):
        if beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                   num_train_timesteps,
                                   dtype=torch.float32) ** 2
        else:
            raise ValueError(beta_schedule)
        self.num_train_timesteps = num_train_timesteps
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.final_alpha_cumprod = (torch.tensor(1.0) if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.steps_offset = steps_offset
        self.clip_sample = clip_sample
        self.prediction_type = prediction_type
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.from_numpy(
            np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int64))

    def set_timesteps(self, num_inference_steps):
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()
        timesteps = timesteps[::-1].copy().astype(np.int64)
        self.timesteps = torch.from_numpy(timesteps) + self.steps_offset

    def _get_variance(self, timestep, prev_timestep):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0
                             else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (
            1 - alpha_prod_t / alpha_prod_t_prev)

    def step(self, model_output, timestep, sample, eta=0.0,
             use_clipped_model_output=False, generator=None,
             variance_noise=None):
        prev_timestep = (timestep - self.num_train_timesteps //
                         self.num_inference_steps)
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0
                             else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t

        if self.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
            pred_epsilon = model_output
        elif self.prediction_type == "sample":
            pred_original_sample = model_output
            pred_epsilon = (sample - alpha_prod_t ** 0.5 *
                            pred_original_sample) / beta_prod_t ** 0.5
        elif self.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t ** 0.5) * sample - (
                beta_prod_t ** 0.5) * model_output
            pred_epsilon = (alpha_prod_t ** 0.5) * model_output + (
                beta_prod_t ** 0.5) * sample
        else:
            raise ValueError(self.prediction_type)

        if self.clip_sample:
            pred_original_sample = pred_original_sample.clamp(-1, 1)

        variance = self._get_variance(timestep, prev_timestep)
        std_dev_t = eta * variance ** 0.5

        if use_clipped_model_output:
            pred_epsilon = (sample - alpha_prod_t ** 0.5 *
                            pred_original_sample) / beta_prod_t ** 0.5

        pred_sample_direction = (
            1 - alpha_prod_t_prev - std_dev_t ** 2) ** 0.5 * pred_epsilon
        prev_sample = (alpha_prod_t_prev ** 0.5 * pred_original_sample +
                       pred_sample_direction)
        if eta > 0:
            assert variance_noise is not None
            prev_sample = prev_sample + std_dev_t * variance_noise
        return prev_sample


# ---------------------------------------------------------------------------
# AutoencoderKL double (stock SD VAE: models/vae.py + autoencoder_kl.py)
# ---------------------------------------------------------------------------

class _VAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(groups, in_ch), in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(min(groups, out_ch), out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _VAEAttention(nn.Module):
    """VAE mid-block single-head Attention (0.19.3 Attention with
    residual_connection=True, bias=True, to_out.0; legacy AttentionBlock
    key-compatible after convert_deprecated_attention)."""

    def __init__(self, channels, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(min(groups, channels), channels,
                                       eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels),
                                     nn.Identity()])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        scores = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1)
        y = self.to_out[0](scores @ v)
        return x + y.transpose(1, 2).view(b, c, h, w)


class _VAEDownEncoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, num_layers, add_downsample, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(
            out_ch, use_conv=True, out_channels=out_ch, padding=0,
            name="op")]) if add_downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _VAEUpDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, num_layers, add_upsample, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VAEResnet(in_ch if i == 0 else out_ch, out_ch, groups)
             for i in range(num_layers)])
        self.upsamplers = (nn.ModuleList([Upsample2D(
            out_ch, use_conv=True, out_channels=out_ch)])
            if add_upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _VAEMid(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList([_VAEResnet(ch, ch, groups),
                                      _VAEResnet(ch, ch, groups)])
        self.attentions = nn.ModuleList([_VAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class AutoencoderKLDouble(nn.Module):
    """Stock SD AutoencoderKL topology with diffusers state-dict keys
    (encoder.down_blocks.N..., decoder.up_blocks.N..., quant_conv, ...).
    encode_mode/decode mirror the calls the reference pipeline makes."""

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, latent_channels=4, in_channels=3,
                 norm_num_groups=32, scaling_factor=0.18215):
        super().__init__()
        self.scaling_factor = scaling_factor
        g = norm_num_groups
        ch = list(block_out_channels)

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        for i, c in enumerate(ch):
            in_ch = ch[max(i - 1, 0)]
            enc.down_blocks.append(_VAEDownEncoderBlock(
                in_ch, c, layers_per_block, add_downsample=i < len(ch) - 1,
                groups=g))
        enc.mid_block = _VAEMid(ch[-1], g)
        enc.conv_norm_out = nn.GroupNorm(min(g, ch[-1]), ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * latent_channels, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = _VAEMid(ch[-1], g)
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            in_ch = rev[max(i - 1, 0)]
            dec.up_blocks.append(_VAEUpDecoderBlock(
                in_ch, c, layers_per_block + 1,
                add_upsample=i < len(ch) - 1, groups=g))
        dec.conv_norm_out = nn.GroupNorm(min(g, ch[0]), ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], in_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        self.latent_channels = latent_channels

    def _encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            h = blk(h)
        h = self.encoder.mid_block(h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def encode_mode(self, x):
        """vae.encode(x).latent_dist.mode() * scaling_factor"""
        moments = self._encode_moments(x)
        mean = moments[:, : self.latent_channels]
        return mean * self.scaling_factor

    def decode(self, z):
        """vae.decode(z / scaling_factor)"""
        h = self.decoder.conv_in(self.post_quant_conv(
            z / self.scaling_factor))
        h = self.decoder.mid_block(h)
        for blk in self.decoder.up_blocks:
            h = blk(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# module assembly + reference import
# ---------------------------------------------------------------------------

def install_diffusers_double() -> None:
    """Register the double under sys.modules['diffusers*'] (idempotent)."""
    if "diffusers" in sys.modules and getattr(
            sys.modules["diffusers"], "_IS_DOUBLE", False):
        return
    here = sys.modules[__name__]

    d = _module("diffusers")
    d._IS_DOUBLE = True
    d.__version__ = "0.19.3"

    cu = _module("diffusers.configuration_utils")
    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    cu.FrozenDict = FrozenDict

    loaders = _module("diffusers.loaders")

    class UNet2DConditionLoadersMixin:
        pass

    loaders.UNet2DConditionLoadersMixin = UNet2DConditionLoadersMixin

    logging_mod = _Logging("diffusers.utils.logging")

    utils = _module("diffusers.utils")
    utils.BaseOutput = BaseOutput
    utils.logging = logging_mod
    utils.deprecate = deprecate
    utils.is_torch_version = is_torch_version
    utils.maybe_allow_in_graph = maybe_allow_in_graph
    utils.DIFFUSERS_CACHE = "/tmp/diffusers_double_cache"
    utils.HF_HUB_OFFLINE = True
    utils.SAFETENSORS_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
    utils.WEIGHTS_NAME = "diffusion_pytorch_model.bin"
    utils._add_variant = lambda name, variant=None: name
    utils._get_model_file = _unused
    utils.is_accelerate_available = lambda: False
    utils.is_safetensors_available = lambda: False
    utils_import = _module("diffusers.utils.import_utils")
    utils_import.is_xformers_available = lambda: True
    utils.import_utils = utils_import

    models = _module("diffusers.models")
    activations = _module("diffusers.models.activations")
    activations.get_activation = get_activation
    attention_processor = _module(
        "diffusers.models.attention_processor")
    attention_processor.Attention = Attention
    attention_processor.AttnProcessor = AttnProcessor
    attention_processor.XFormersAttnProcessor = XFormersAttnProcessor
    attention_processor.AttentionProcessor = object  # typing alias only
    attention = _module("diffusers.models.attention")
    attention.FeedForward = FeedForward
    attention.GEGLU = GEGLU
    attention.Attention = Attention

    class AdaLayerNorm(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError("double: ada_norm unused")

    attention.AdaLayerNorm = AdaLayerNorm
    attention.AdaLayerNormZero = AdaLayerNorm

    embeddings = _module("diffusers.models.embeddings")
    embeddings.TimestepEmbedding = TimestepEmbedding
    embeddings.Timesteps = Timesteps
    embeddings.get_timestep_embedding = get_timestep_embedding
    for name in _PLACEHOLDER_EMBEDDINGS:
        setattr(embeddings, name, type(name, (_Placeholder,), {}))

    modeling_utils = _module("diffusers.models.modeling_utils")
    modeling_utils.ModelMixin = ModelMixin
    modeling_utils.load_state_dict = _unused
    modeling_utils._load_state_dict_into_model = _unused

    resnet = _module("diffusers.models.resnet")
    resnet.ResnetBlock2D = ResnetBlock2D
    resnet.Downsample2D = Downsample2D
    resnet.Upsample2D = Upsample2D

    unet_2d_blocks = _module("diffusers.models.unet_2d_blocks")
    unet_2d_blocks.DownBlock2D = DownBlock2D
    unet_2d_blocks.UpBlock2D = UpBlock2D
    for name in _PLACEHOLDER_BLOCKS:
        setattr(unet_2d_blocks, name, type(name, (_Placeholder,), {}))

    lora = _module("diffusers.models.lora")

    class LoRACompatibleConv(nn.Conv2d):
        pass

    class LoRACompatibleLinear(nn.Linear):
        pass

    lora.LoRACompatibleConv = LoRACompatibleConv
    lora.LoRACompatibleLinear = LoRACompatibleLinear

    models.activations = activations
    models.attention = attention
    models.attention_processor = attention_processor
    models.embeddings = embeddings
    models.modeling_utils = modeling_utils
    models.resnet = resnet
    models.unet_2d_blocks = unet_2d_blocks
    models.lora = lora

    d.configuration_utils = cu
    d.loaders = loaders
    d.utils = utils
    d.models = models

    xformers = _module("xformers")
    xformers_ops = _module("xformers.ops")
    xformers_ops.memory_efficient_attention = memory_efficient_attention
    xformers.ops = xformers_ops

    mods = {
        "diffusers": d,
        "diffusers.configuration_utils": cu,
        "diffusers.loaders": loaders,
        "diffusers.utils": utils,
        "diffusers.utils.logging": logging_mod,
        "diffusers.utils.import_utils": utils_import,
        "diffusers.models": models,
        "diffusers.models.activations": activations,
        "diffusers.models.attention": attention,
        "diffusers.models.attention_processor": attention_processor,
        "diffusers.models.embeddings": embeddings,
        "diffusers.models.modeling_utils": modeling_utils,
        "diffusers.models.resnet": resnet,
        "diffusers.models.unet_2d_blocks": unet_2d_blocks,
        "diffusers.models.lora": lora,
        "xformers": xformers,
        "xformers.ops": xformers_ops,
    }
    sys.modules.update(mods)


def import_reference_mvdiffusion():
    """Import the REFERENCE's mvdiffusion.models package for real, under the
    installed diffusers double. Returns the unet_mv2d_condition module."""
    import importlib.util
    from pathlib import Path

    install_diffusers_double()
    base = Path("/root/reference/2_charactor_reconstructor")
    pkg = _module("mvdiffusion")
    pkg.__path__ = [str(base / "mvdiffusion")]
    sys.modules.setdefault("mvdiffusion", pkg)
    mpkg = _module("mvdiffusion.models")
    mpkg.__path__ = [str(base / "mvdiffusion" / "models")]
    sys.modules.setdefault("mvdiffusion.models", mpkg)

    def _load(name, fname):
        full = f"mvdiffusion.models.{name}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(
            full, base / "mvdiffusion" / "models" / fname)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("transformer_mv2d", "transformer_mv2d.py")
    _load("unet_mv2d_blocks", "unet_mv2d_blocks.py")
    return _load("unet_mv2d_condition", "unet_mv2d_condition.py")
