"""Port reference PyTorch checkpoints into this framework's flax param trees.

The reference stage-1 generator ships as a flat ``state_dict`` of the
``nn.Sequential``-built FFCResNetGenerator (``predict.py:14-18``; layer
layout ffc.py:304-366). This module maps those names onto our flax module
tree (models/ffc.py) and converts layouts:
  conv   OIHW → HWIO      (transpose 2,3,1,0)
  convT  (in,out,kh,kw) → (kh,kw,in,out)  (transpose 2,3,0,1)
  BN     weight/bias/running_mean/running_var → scale/bias/mean/var
No torch import is required: a state_dict-like mapping of numpy arrays is
enough (load .ckpt/.pth via ``torch.load`` externally, or safetensors).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv_w(a: np.ndarray) -> np.ndarray:
    return np.asarray(a).transpose(2, 3, 1, 0)


def _convt_w(a: np.ndarray) -> np.ndarray:
    return np.asarray(a).transpose(2, 3, 0, 1)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn_entries(flax_prefix: Tuple[str, ...], torch_prefix: str):
    """Yield (torch_key, flax_params_path, flax_stats_path, transform)."""
    bn = flax_prefix + ("BatchNorm_0",)
    yield torch_prefix + ".weight", bn + ("scale",), None, np.asarray
    yield torch_prefix + ".bias", bn + ("bias",), None, np.asarray
    yield torch_prefix + ".running_mean", None, bn + ("mean",), np.asarray
    yield torch_prefix + ".running_var", None, bn + ("var",), np.asarray


def _ffc_bn_act_entries(flax_prefix: Tuple[str, ...], torch_prefix: str):
    """Map one FFC_BN_ACT block (reference ffc.py:227-254)."""
    ffc = flax_prefix + ("ffc",)
    for branch in ("convl2l", "convl2g", "convg2l"):
        tp = f"{torch_prefix}.ffc.{branch}"
        yield tp + ".weight", ffc + (branch, "kernel"), None, _conv_w
        yield tp + ".bias", ffc + (branch, "bias"), None, np.asarray
    # spectral g2g (reference ffc.py:115-162)
    st = ffc + ("convg2g",)
    tp = f"{torch_prefix}.ffc.convg2g"
    yield tp + ".conv1.0.weight", st + ("conv1", "kernel"), None, _conv_w
    yield from _bn_entries(st + ("bn1",), tp + ".conv1.1")
    yield tp + ".fu.conv_layer.weight", st + ("fu", "conv", "kernel"), None, _conv_w
    yield from _bn_entries(st + ("fu", "bn"), tp + ".fu.bn")
    yield tp + ".lfu.conv_layer.weight", st + ("lfu", "conv", "kernel"), None, _conv_w
    yield from _bn_entries(st + ("lfu", "bn"), tp + ".lfu.bn")
    yield tp + ".conv2.weight", st + ("conv2", "kernel"), None, _conv_w
    # stream norms
    yield from _bn_entries(flax_prefix + ("bn_l",), torch_prefix + ".bn_l")
    yield from _bn_entries(flax_prefix + ("bn_g",), torch_prefix + ".bn_g")


def ffc_generator_key_map(n_downsampling: int = 3, n_blocks: int = 9):
    """Full (torch_key → flax path) map for FFCResNetGenerator.

    torch Sequential indices (ffc.py:304-360): 0 pad, 1 init FFC_BN_ACT,
    2..1+nd downsamples, then n_blocks resblocks, concat, then per-upsample
    [ConvT, BN, act], final pad + conv head + out act."""
    entries = []
    entries += list(_ffc_bn_act_entries(("init",), "model.1"))
    idx = 2
    for i in range(n_downsampling):
        entries += list(_ffc_bn_act_entries((f"down{i}",), f"model.{idx}"))
        idx += 1
    for i in range(n_blocks):
        for conv in ("conv1", "conv2"):
            entries += list(_ffc_bn_act_entries((f"block{i}", conv),
                                                f"model.{idx}.{conv}"))
        idx += 1
    idx += 1  # ConcatTupleLayer
    for i in range(n_downsampling):
        tp = f"model.{idx}"
        entries.append((tp + ".weight", (f"up{i}", "kernel"), None, _convt_w))
        entries.append((tp + ".bias", (f"up{i}", "bias"), None, np.asarray))
        entries += list(_bn_entries((f"up{i}_bn",), f"model.{idx + 1}"))
        idx += 3
    idx += 1  # ReflectionPad
    entries.append((f"model.{idx}.weight", ("head", "kernel"), None, _conv_w))
    entries.append((f"model.{idx}.bias", ("head", "bias"), None, np.asarray))
    return entries


def convert_ffc_generator(state_dict: Mapping[str, Any],
                          n_downsampling: int = 3, n_blocks: int = 9,
                          strict: bool = False) -> Dict[str, Dict]:
    """state_dict (torch name → array-like) → flax variables
    {'params': ..., 'batch_stats': ...}. Missing keys are skipped unless
    ``strict`` (absent branches like lfu/convl2g are expected to be missing
    depending on ratios)."""
    params: Dict = {}
    stats: Dict = {}
    for tkey, ppath, spath, tf in ffc_generator_key_map(n_downsampling, n_blocks):
        if tkey not in state_dict:
            if strict:
                raise KeyError(f"missing torch key {tkey}")
            continue
        val = tf(np.asarray(state_dict[tkey]))
        if ppath is not None:
            _set(params, ppath, val)
        else:
            _set(stats, spath, val)
    return {"params": params, "batch_stats": stats}


def _bn_at(flax_bn_path: Tuple[str, ...], torch_prefix: str):
    """BN entries with an explicit flax path (used when the BatchNorm is a
    named top-level module rather than ConvBlock's inline BatchNorm_0)."""
    yield torch_prefix + ".weight", flax_bn_path + ("scale",), None, np.asarray
    yield torch_prefix + ".bias", flax_bn_path + ("bias",), None, np.asarray
    yield torch_prefix + ".running_mean", None, flax_bn_path + ("mean",), np.asarray
    yield torch_prefix + ".running_var", None, flax_bn_path + ("var",), np.asarray


def generator_j_key_map(resnet_blocks: int = 7, use_bias: bool = False,
                        tanh: bool = True, append_smoothers: bool = True,
                        norm: str = "batch_norm"):
    """(torch key → flax path) map for the reference GeneratorJ
    (3_style_translator/training/models.py:24-192) onto models/generator_j.py.

    torch module names: conv{0,1,2}.{conv,normalization}, resnets.{i}.{conv_0,
    normalization,conv_1}, upconv{2,1} Sequential [upsample, conv, norm, act],
    conv_11 Sequential [conv, relu], conv_11_a Sequential [conv, relu, bn,
    conv, relu], conv_12 (Sequential [conv, tanh] iff tanh else conv).
    """
    entries = []

    def conv(tp: str, fp: Tuple[str, ...], bias: bool) -> None:
        entries.append((tp + ".weight", fp + ("kernel",), None, _conv_w))
        if bias:
            entries.append((tp + ".bias", fp + ("bias",), None, np.asarray))

    has_norm = norm == "batch_norm"
    for name in ("conv0", "conv1", "conv2"):
        conv(f"{name}.conv", (name,), use_bias)
        if has_norm:
            entries.extend(_bn_entries((name,), f"{name}.normalization"))
    for i in range(resnet_blocks):
        conv(f"resnets.{i}.conv_0", (f"res{i}_conv0",), use_bias)
        if has_norm:
            entries.extend(_bn_entries((f"res{i}_conv0",),
                                       f"resnets.{i}.normalization"))
        conv(f"resnets.{i}.conv_1", (f"res{i}_conv1",), use_bias)
    for name in ("upconv2", "upconv1"):
        conv(f"{name}.1", (name,), False)
        if has_norm:
            entries.extend(_bn_entries((name,), f"{name}.2"))
    conv("conv_11.0", ("conv_11",), use_bias)
    if append_smoothers:
        conv("conv_11_a.0", ("smooth0",), use_bias)
        entries.extend(_bn_at(("smooth_bn",), "conv_11_a.2"))
        conv("conv_11_a.3", ("smooth1",), use_bias)
    head = "conv_12.0" if tanh else "conv_12"
    entries.append((head + ".weight", ("head_kernel",), None, _conv_w))
    entries.append((head + ".bias", ("head_bias",), None, np.asarray))
    return entries


def discriminator_n_key_map(n_layers: int = 2, use_bias: bool = True):
    """(torch key → flax path) for DiscriminatorN_IN
    (3_style_translator/training/models.py:426-474). InstanceNorm2d has no
    parameters (torch default affine=False), so only convs are mapped."""
    entries = []
    names = ["conv0"] + [f"conv_{l}" for l in range(1, n_layers + 1)] + ["conv_out"]
    for name in names:
        tp = f"net.{name}.conv"
        entries.append((tp + ".weight", (name, "kernel"), None, _conv_w))
        if use_bias:
            entries.append((tp + ".bias", (name, "bias"), None, np.asarray))
    return entries


def _convert_by_map(entries, state_dict: Mapping[str, Any],
                    strict: bool) -> Dict[str, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for tkey, ppath, spath, tf in entries:
        if tkey not in state_dict:
            if strict:
                raise KeyError(f"missing torch key {tkey}")
            continue
        val = tf(np.asarray(state_dict[tkey]))
        if ppath is not None:
            _set(params, ppath, val)
        else:
            _set(stats, spath, val)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_generator_j(state_dict: Mapping[str, Any], resnet_blocks: int = 7,
                        use_bias: bool = False, tanh: bool = True,
                        append_smoothers: bool = True,
                        norm: str = "batch_norm",
                        strict: bool = True) -> Dict[str, Dict]:
    """Reference GeneratorJ state_dict → flax variables for
    models/generator_j.py::GeneratorJ. Flax head params are raw leaves
    (head_kernel/head_bias), everything else ConvBlock/BatchNorm trees."""
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    entries = generator_j_key_map(resnet_blocks, use_bias, tanh,
                                  append_smoothers, norm)
    return _convert_by_map(entries, sd, strict)


def convert_discriminator_n(state_dict: Mapping[str, Any],
                            n_layers: int = 2, use_bias: bool = True,
                            strict: bool = True) -> Dict[str, Dict]:
    """Reference DiscriminatorN_IN state_dict → flax variables."""
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(discriminator_n_key_map(n_layers, use_bias), sd,
                           strict)


def global_generator_key_map(n_downsampling: int = 3, n_blocks: int = 9):
    """(torch key → flax path) for the pix2pixHD GlobalGenerator
    (1_lama_contour_remover/saicinpainting/training/modules/pix2pixhd.py:
    341-436, default conv_kind) onto models/pix2pixhd.py::GlobalGenerator.

    torch Sequential layout: 0 pad, 1 conv7, 2 bn, 3 act, then per
    downsample [conv, bn, act], then n_blocks ResnetBlock (conv_block
    Sequential: 0 pad, 1 conv, 2 bn, 3 act, 4 pad, 5 conv, 6 bn), then per
    upsample [convT, bn, act], then pad + conv head (+ out act)."""
    entries = []
    entries.append(("model.1.weight", ("conv_in", "kernel"), None, _conv_w))
    entries.append(("model.1.bias", ("conv_in", "bias"), None, np.asarray))
    entries.extend(_bn_at(("norm_in",), "model.2"))
    idx = 4
    for i in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"down{i}", "kernel"),
                        None, _conv_w))
        entries.append((f"model.{idx}.bias", (f"down{i}", "bias"),
                        None, np.asarray))
        entries.extend(_bn_at((f"down{i}_norm",), f"model.{idx + 1}"))
        idx += 3
    for i in range(n_blocks):
        tp = f"model.{idx}.conv_block"
        entries.append((tp + ".1.weight", (f"block{i}", "conv1", "kernel"),
                        None, _conv_w))
        entries.append((tp + ".1.bias", (f"block{i}", "conv1", "bias"),
                        None, np.asarray))
        entries.extend(_bn_at((f"block{i}", "norm1"), tp + ".2"))
        entries.append((tp + ".5.weight", (f"block{i}", "conv2", "kernel"),
                        None, _conv_w))
        entries.append((tp + ".5.bias", (f"block{i}", "conv2", "bias"),
                        None, np.asarray))
        entries.extend(_bn_at((f"block{i}", "norm2"), tp + ".6"))
        idx += 1
    for j in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"up{j}_kernel",),
                        None, _convt_w))
        entries.append((f"model.{idx}.bias", (f"up{j}_bias",),
                        None, np.asarray))
        entries.extend(_bn_at((f"up{j}_norm",), f"model.{idx + 1}"))
        idx += 3
    idx += 1  # ReflectionPad
    entries.append((f"model.{idx}.weight", ("conv_out_kernel",),
                    None, _conv_w))
    entries.append((f"model.{idx}.bias", ("conv_out_bias",),
                    None, np.asarray))
    return entries


def _resnet_block_entries(i: int, torch_idx: int, kind: str = "resnetblock",
                          dilation: int = 1, dilation_num: int = 3,
                          in_dim: bool = False, conv_kind: str = "default"):
    """Entries for one bottleneck block at Sequential position ``torch_idx``.

    kind: resnetblock | resnetblock5x5 | resnetblockdwdil (same torch
    conv_block layout: [pad, conv, bn, act, pad, conv, bn] → 1/2/5/6) |
    multidilatedresnetblock (conv_block [mdconv, bn, act, mdconv, bn] →
    0/1/3/4, each mdconv a convs.{j} ModuleList). conv_kind selects the
    conv ctor of the non-multidilated kinds: default (nn.Conv2d) or
    depthwise (DepthWiseSeperableConv: depthwise/pointwise sub-convs)."""
    tp = f"model.{torch_idx}.conv_block"
    fb = f"block{i}"
    if kind == "multidilatedresnetblock":
        for cpos, cname, npos, nname in ((0, "conv1", 1, "norm1"),
                                         (3, "conv2", 4, "norm2")):
            for j in range(dilation_num):
                yield (f"{tp}.{cpos}.convs.{j}.weight",
                       (fb, cname, f"kernel{j}"), None, _conv_w)
                yield (f"{tp}.{cpos}.convs.{j}.bias",
                       (fb, cname, f"bias{j}"), None, np.asarray)
            yield from _bn_at((fb, nname), f"{tp}.{npos}")
        return
    if conv_kind == "multidilated":
        raise NotImplementedError(
            "ResnetBlock with a multidilated conv ctor is unbuildable in the"
            " reference itself (duplicate dilation kwarg)")
    # plain / 5x5 / dilated blocks share the padded-Sequential layout;
    # the flax param naming differs for dilation>1 (ResnetBlock._conv
    # inlines the kernel as conv{k}_kernel instead of a conv{k} submodule)
    for cpos, cname, npos, nname in ((1, "conv1", 2, "norm1"),
                                     (5, "conv2", 6, "norm2")):
        if conv_kind == "depthwise":
            yield (f"{tp}.{cpos}.depthwise.weight",
                   (fb, cname, "depthwise"), None, _conv_w)
            yield (f"{tp}.{cpos}.depthwise.bias",
                   (fb, cname, "depthwise_bias"), None, np.asarray)
            yield (f"{tp}.{cpos}.pointwise.weight",
                   (fb, cname, "pointwise"), None, _conv_w)
            yield (f"{tp}.{cpos}.pointwise.bias",
                   (fb, cname, "pointwise_bias"), None, np.asarray)
        elif kind == "resnetblockdwdil" and dilation != 1:
            yield (f"{tp}.{cpos}.weight", (fb, f"{cname}_kernel"),
                   None, _conv_w)
            yield (f"{tp}.{cpos}.bias", (fb, f"{cname}_bias"),
                   None, np.asarray)
        else:
            yield (f"{tp}.{cpos}.weight", (fb, cname, "kernel"),
                   None, _conv_w)
            yield (f"{tp}.{cpos}.bias", (fb, cname, "bias"),
                   None, np.asarray)
        yield from _bn_at((fb, nname), f"{tp}.{npos}")
    if in_dim:
        yield (f"model.{torch_idx}.input_conv.weight",
               (fb, "input_conv_kernel"), None, _conv_w)
        yield (f"model.{torch_idx}.input_conv.bias",
               (fb, "input_conv_bias"), None, np.asarray)


def _global_sequential_map(n_downsampling: int, blocks):
    """Shared stem/downsample/upsample/head map of the pix2pixHD Sequential
    generators (GlobalGenerator layout, pix2pixhd.py:341-436), with the
    bottleneck section described by ``blocks``: a list of
    (kind, dilation, dilation_num, conv_kind) per block."""
    entries = []
    entries.append(("model.1.weight", ("conv_in", "kernel"), None, _conv_w))
    entries.append(("model.1.bias", ("conv_in", "bias"), None, np.asarray))
    entries.extend(_bn_at(("norm_in",), "model.2"))
    idx = 4
    for i in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"down{i}", "kernel"),
                        None, _conv_w))
        entries.append((f"model.{idx}.bias", (f"down{i}", "bias"),
                        None, np.asarray))
        entries.extend(_bn_at((f"down{i}_norm",), f"model.{idx + 1}"))
        idx += 3
    for i, (kind, dilation, dilation_num, conv_kind) in enumerate(blocks):
        entries.extend(_resnet_block_entries(i, idx, kind, dilation,
                                             dilation_num,
                                             conv_kind=conv_kind))
        idx += 1
    for j in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"up{j}_kernel",),
                        None, _convt_w))
        entries.append((f"model.{idx}.bias", (f"up{j}_bias",),
                        None, np.asarray))
        entries.extend(_bn_at((f"up{j}_norm",), f"model.{idx + 1}"))
        idx += 3
    idx += 1  # ReflectionPad
    entries.append((f"model.{idx}.weight", ("conv_out_kernel",),
                    None, _conv_w))
    entries.append((f"model.{idx}.bias", ("conv_out_bias",),
                    None, np.asarray))
    return entries


def multidilated_global_generator_key_map(n_downsampling: int = 3,
                                          n_blocks: int = 3,
                                          dilation_num: int = 3):
    """MultiDilatedGlobalGenerator (pix2pixhd.py:178-237): GlobalGenerator
    layout with multidilated bottleneck blocks."""
    return _global_sequential_map(
        n_downsampling,
        [("multidilatedresnetblock", 1, dilation_num,
          "multidilated")] * n_blocks)


def expand_manual_block_spec(manual_block_spec, n_blocks: int = 3,
                             resnet_block_kind: str = "multidilatedresnetblock",
                             resnet_conv_kind: str = "multidilated",
                             resnet_dilation: int = 1,
                             dilation_num: int = 3):
    """Expand a ConfigGlobalGenerator manual_block_spec (pix2pixhd.py:282-315
    make_and_add_blocks semantics, incl. use_default) into the per-block
    (kind, dilation, dilation_num) list both the flax module and the key map
    consume."""
    specs = [dict(s) for s in manual_block_spec] or [
        {"n_blocks": n_blocks, "use_default": True}]
    blocks = []
    for spec in specs:
        if spec.get("use_default"):
            kind, dil, ck = (resnet_block_kind, resnet_dilation,
                             resnet_conv_kind)
        else:
            kind = spec.get("resnet_block_kind", resnet_block_kind)
            ck = spec.get("resnet_conv_kind", resnet_conv_kind)
            dil = spec.get("resnet_dilation", resnet_dilation)
            if dil is None:
                dil = resnet_dilation
        blocks += [(kind, dil, dilation_num, ck)] * int(spec["n_blocks"])
    return blocks


def config_global_generator_key_map(n_downsampling: int = 3,
                                    manual_block_spec=(), n_blocks: int = 3,
                                    **spec_defaults):
    """ConfigGlobalGenerator (pix2pixhd.py:239-326)."""
    return _global_sequential_map(
        n_downsampling,
        expand_manual_block_spec(manual_block_spec, n_blocks,
                                 **spec_defaults))


def convert_config_global_generator(state_dict: Mapping[str, Any],
                                    n_downsampling: int = 3,
                                    manual_block_spec=(), n_blocks: int = 3,
                                    strict: bool = True,
                                    **spec_defaults) -> Dict[str, Dict]:
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(
        config_global_generator_key_map(n_downsampling, manual_block_spec,
                                        n_blocks, **spec_defaults),
        sd, strict)


def convert_multidilated_global_generator(state_dict: Mapping[str, Any],
                                          n_downsampling: int = 3,
                                          n_blocks: int = 3,
                                          dilation_num: int = 3,
                                          strict: bool = True):
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(
        multidilated_global_generator_key_map(n_downsampling, n_blocks,
                                              dilation_num), sd, strict)


def superchannels_generator_key_map(n_downsampling: int = 3,
                                    n_blocks: int = 6,
                                    use_bias: bool = False):
    """GlobalGeneratorFromSuperChannels (pix2pixhd.py:450-561). With bn
    norms the stem/down/up convs carry no bias (use_bias gate :457-461);
    block group boundaries add input_conv 1×1s."""
    entries = []
    entries.append(("model.1.weight", ("conv_in_kernel",), None, _conv_w))
    if use_bias:
        entries.append(("model.1.bias", ("conv_in_bias",), None, np.asarray))
    entries.extend(_bn_at(("norm_in",), "model.2"))
    idx = 4
    for i in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"down{i}_kernel",),
                        None, _conv_w))
        if use_bias:
            entries.append((f"model.{idx}.bias", (f"down{i}_bias",),
                            None, np.asarray))
        entries.extend(_bn_at((f"down{i}_norm",), f"model.{idx + 1}"))
        idx += 3
    n1 = n_blocks // 3
    n2 = n1
    n3 = n_blocks - n1 - n2
    bi = 0
    for gi, gn in enumerate((n1, n2, n3)):
        for i in range(gn):
            entries.extend(_resnet_block_entries(
                bi, idx, "resnetblock", in_dim=(gi > 0 and i == 0)))
            bi += 1
            idx += 1
    for j in range(n_downsampling):
        entries.append((f"model.{idx}.weight", (f"up{j}_kernel",),
                        None, _convt_w))
        if use_bias:
            entries.append((f"model.{idx}.bias", (f"up{j}_bias",),
                            None, np.asarray))
        entries.extend(_bn_at((f"up{j}_norm",), f"model.{idx + 1}"))
        idx += 3
    idx += 1
    entries.append((f"model.{idx}.weight", ("conv_out_kernel",),
                    None, _conv_w))
    entries.append((f"model.{idx}.bias", ("conv_out_bias",),
                    None, np.asarray))
    return entries


def convert_superchannels_generator(state_dict: Mapping[str, Any],
                                    n_downsampling: int = 3,
                                    n_blocks: int = 6,
                                    use_bias: bool = False,
                                    strict: bool = True) -> Dict[str, Dict]:
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(
        superchannels_generator_key_map(n_downsampling, n_blocks, use_bias),
        sd, strict)


def nlayer_discriminator_key_map(n_layers: int = 3,
                                 middle_kind: str = "default",
                                 dilation_num: int = 1):
    """pix2pixHD NLayerDiscriminator / MultidilatedNLayerDiscriminator
    (pix2pixhd.py:565-613 / :616-664): model{n} Sequentials; the
    multidilated variant swaps the middle stride-2 convs for
    MultidilatedConv (convs.{j} ModuleList)."""
    entries = []
    entries.append(("model0.0.weight", ("conv0", "kernel"), None, _conv_w))
    entries.append(("model0.0.bias", ("conv0", "bias"), None, np.asarray))
    for n in range(1, n_layers):
        if middle_kind == "multidilated":
            for j in range(dilation_num):
                entries.append((f"model{n}.0.convs.{j}.weight",
                                (f"conv{n}", f"kernel{j}"), None, _conv_w))
                entries.append((f"model{n}.0.convs.{j}.bias",
                                (f"conv{n}", f"bias{j}"), None, np.asarray))
        else:
            entries.append((f"model{n}.0.weight", (f"conv{n}", "kernel"),
                            None, _conv_w))
            entries.append((f"model{n}.0.bias", (f"conv{n}", "bias"),
                            None, np.asarray))
        entries.extend(_bn_at((f"norm{n}",), f"model{n}.1"))
    n = n_layers
    entries.append((f"model{n}.0.weight", (f"conv{n}", "kernel"),
                    None, _conv_w))
    entries.append((f"model{n}.0.bias", (f"conv{n}", "bias"),
                    None, np.asarray))
    entries.extend(_bn_at((f"norm{n}",), f"model{n}.1"))
    entries.append((f"model{n + 1}.0.weight", ("conv_score", "kernel"),
                    None, _conv_w))
    entries.append((f"model{n + 1}.0.bias", ("conv_score", "bias"),
                    None, np.asarray))
    return entries


def convert_nlayer_discriminator(state_dict: Mapping[str, Any],
                                 n_layers: int = 3,
                                 middle_kind: str = "default",
                                 dilation_num: int = 1,
                                 strict: bool = True) -> Dict[str, Dict]:
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(
        nlayer_discriminator_key_map(n_layers, middle_kind, dilation_num),
        sd, strict)


def ffc_nlayer_discriminator_key_map(n_layers: int = 3):
    """FFCNLayerDiscriminator (reference ffc.py:369-432): model{n}
    Sequentials of one FFC_BN_ACT each (+ ConcatTupleLayer at the last),
    then a plain score conv at model{n_layers+1}.0."""
    entries = []
    for n in range(n_layers + 1):
        entries.extend(_ffc_bn_act_entries((f"model{n}",), f"model{n}.0"))
    tp = f"model{n_layers + 1}.0"
    entries.append((tp + ".weight", (f"model{n_layers + 1}", "kernel"),
                    None, _conv_w))
    entries.append((tp + ".bias", (f"model{n_layers + 1}", "bias"),
                    None, np.asarray))
    return entries


def convert_ffc_nlayer_discriminator(state_dict: Mapping[str, Any],
                                     n_layers: int = 3) -> Dict[str, Dict]:
    """Missing branch keys (zero-width convl2g/g2l/lfu per the ratios) are
    skipped, like convert_ffc_generator."""
    params: Dict = {}
    stats: Dict = {}
    for tkey, ppath, spath, tf in ffc_nlayer_discriminator_key_map(n_layers):
        if tkey not in state_dict:
            continue
        val = tf(np.asarray(state_dict[tkey]))
        if ppath is not None:
            _set(params, ppath, val)
        else:
            _set(stats, spath, val)
    return {"params": params, "batch_stats": stats}


def convert_global_generator(state_dict: Mapping[str, Any],
                             n_downsampling: int = 3, n_blocks: int = 9,
                             strict: bool = True) -> Dict[str, Dict]:
    sd = {k: v for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    return _convert_by_map(
        global_generator_key_map(n_downsampling, n_blocks), sd, strict)


def vgg19_features_to_npz(state_dict: Mapping[str, Any], npz_path: str,
                          max_index: int = 7) -> None:
    """Save a torchvision-style ``features.N.{weight,bias}`` state_dict (or a
    bare ``N.{weight,bias}`` Sequential dict) to the npz overlay format that
    models/generator_j.py::load_vgg_weights_npz consumes. This is the
    documented conversion path for real VGG19 weights
    (reference models.py:480-548 uses torchvision ImageNet weights)."""
    out = {}
    for k, v in state_dict.items():
        key = k if k.startswith("features.") else "features." + k
        idx = int(key.split(".")[1])
        if idx <= max_index and key.endswith((".weight", ".bias")):
            out[key] = np.asarray(v)
    np.savez(npz_path, **out)


def invert_to_torch_names(variables: Mapping[str, Any],
                          n_downsampling: int = 3,
                          n_blocks: int = 9) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax → torch names); used for round-trip testing and
    exporting checkpoints consumable by the reference."""
    def _get(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, Mapping) or p not in node:
                return None
            node = node[p]
        return node

    inv_tf = {_conv_w: lambda a: np.asarray(a).transpose(3, 2, 0, 1),
              _convt_w: lambda a: np.asarray(a).transpose(2, 3, 0, 1),
              np.asarray: np.asarray}
    out = {}
    for tkey, ppath, spath, tf in ffc_generator_key_map(n_downsampling, n_blocks):
        src = _get(variables.get("params", {}), ppath) if ppath is not None \
            else _get(variables.get("batch_stats", {}), spath)
        if src is not None:
            out[tkey] = inv_tf[tf](src)
    return out
