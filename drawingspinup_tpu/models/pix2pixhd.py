"""pix2pixHD generator/discriminator zoo — flax rebuild.

Capability parity with the reference's alternate stage-1 backbones
(``1_lama_contour_remover/saicinpainting/training/modules/pix2pixhd.py``):
GlobalGenerator (:341-436, the ``lama-regular.yaml`` generator),
MultiDilatedGlobalGenerator (:178-237), ConfigGlobalGenerator (:239-326),
GlobalGeneratorFromSuperChannels (:450-561), NLayerDiscriminator (:565-613),
MultidilatedNLayerDiscriminator (:616-664), plus the module helpers of
``base.py`` / ``depthwise_sep_conv.py`` / ``multidilated_conv.py`` /
``spatial_transform.py``.

Shared NHWC building blocks; conv kinds (default / depthwise / multidilated)
select the conv constructor exactly like the reference's
``get_conv_block_ctor``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.ops.conv import conv2d, conv_transpose2d_torch, pad2d


def norm_apply(kind: Optional[str], x, train: bool, name: str):
    if kind == "bn":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name=name)(x)
    if kind == "in":
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return x


class DepthwiseSeparableConv(nn.Module):
    """depthwise_sep_conv.py:3-16."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        wd = self.param("depthwise", nn.initializers.he_normal(),
                        (self.kernel, self.kernel, 1, in_ch))
        x = conv2d(x, wd, stride=self.stride, padding=self.padding,
                   groups=in_ch)
        wp = self.param("pointwise", nn.initializers.he_normal(),
                        (1, 1, in_ch, self.features))
        return conv2d(x, wp)


class MultiDilatedConv(nn.Module):
    """multidilated_conv.py:6-98: the output channels are split across
    ``dilation_num`` parallel convs of dilation 2^i, then concatenated.
    Per-branch SAME padding d·(k−1)/2 keeps spatial shapes aligned."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation_num: int = 3
    shared_weights: bool = False

    @nn.compact
    def __call__(self, x):
        outs = []
        n_branches = min(self.dilation_num, self.features)
        per = self.features // n_branches
        rem = self.features - per * (n_branches - 1)
        for i in range(n_branches):
            d = 2 ** i
            ch = rem if i == n_branches - 1 else per
            w = self.param(f"kernel{i}", nn.initializers.he_normal(),
                           (self.kernel, self.kernel, x.shape[-1], ch))
            # asymmetric SAME padding keeps every dilation branch the same
            # spatial size (exact also for even kernels)
            total = d * (self.kernel - 1)
            lo, hi = total // 2, total - total // 2
            xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
            outs.append(conv2d(xp, w, stride=self.stride, dilation=d))
        return jnp.concatenate(outs, axis=-1)


def make_conv(kind: str, features: int, kernel: int = 3, stride: int = 1,
              padding: int = 0, name: str = "conv"):
    """get_conv_block_ctor equivalent (base.py:21-31)."""
    if kind == "depthwise":
        return DepthwiseSeparableConv(features, kernel, stride, padding,
                                      name=name)
    if kind == "multidilated":
        return MultiDilatedConv(features, kernel, stride=stride, name=name)

    class _Conv(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("kernel", nn.initializers.he_normal(),
                           (kernel, kernel, x.shape[-1], features))
            b = self.param("bias", nn.initializers.zeros, (features,))
            return conv2d(x, w, b, stride=stride, padding=padding)

    return _Conv(name=name)


class ResnetBlock(nn.Module):
    """pix2pixhd.py:30-57 (3×3, reflect pad), the 5×5 variant (:77-110), and
    the dilated form used by resnetblockdwdil specs (:112-141: reflect pad =
    dilation·(k//2), conv dilation per branch)."""

    dim: int
    kernel: int = 3
    conv_kind: str = "default"
    norm: str = "bn"
    dilation: int = 1
    second_dilation: Optional[int] = None

    def _conv(self, h, d: int, name: str):
        p = d * (self.kernel // 2)
        if self.conv_kind == "multidilated":
            return make_conv(self.conv_kind, self.dim, self.kernel,
                             name=name)(h)   # pads internally per branch
        h = pad2d(h, p, "reflect")
        if d == 1:
            return make_conv(self.conv_kind, self.dim, self.kernel,
                             name=name)(h)
        w = self.param(f"{name}_kernel", nn.initializers.he_normal(),
                       (self.kernel, self.kernel, h.shape[-1], self.dim))
        b = self.param(f"{name}_bias", nn.initializers.zeros, (self.dim,))
        return conv2d(h, w, b, dilation=d)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d2 = self.second_dilation or self.dilation
        h = self._conv(x, self.dilation, "conv1")
        h = norm_apply(self.norm, h, train, "norm1")
        h = jax.nn.relu(h)
        h = self._conv(h, d2, "conv2")
        h = norm_apply(self.norm, h, train, "norm2")
        return x + h


class MultidilatedResnetBlock(nn.Module):
    """pix2pixhd.py:60-75."""

    dim: int
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = MultiDilatedConv(self.dim, name="conv1")(x)
        h = norm_apply(self.norm, h, train, "norm1")
        h = jax.nn.relu(h)
        h = MultiDilatedConv(self.dim, name="conv2")(h)
        h = norm_apply(self.norm, h, train, "norm2")
        return x + h


class _GlobalBase(nn.Module):
    """Shared pix2pixHD topology: c7s1 → n stride-2 downs → blocks → ups →
    c7s1 head + activation."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    conv_kind: str = "default"
    block_kind: str = "default"   # default | multidilated
    norm: str = "bn"
    out_act: str = "tanh"         # tanh | sigmoid | none
    deconv_kind: str = "convtranspose"  # convtranspose | bilinear

    def _bottleneck(self, h, dim: int, train: bool):
        for i in range(self.n_blocks):
            if self.block_kind == "multidilated":
                h = MultidilatedResnetBlock(dim, norm=self.norm,
                                            name=f"block{i}")(h, train)
            else:
                h = ResnetBlock(dim, conv_kind=self.conv_kind,
                                norm=self.norm, name=f"block{i}")(h, train)
        return h

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_kind == "multidilated":
            # MultiDilatedConv pads internally (per-branch SAME)
            h = make_conv(self.conv_kind, self.ngf, 7, name="conv_in")(x)
        else:
            h = pad2d(x, 3, "reflect")
            h = make_conv(self.conv_kind, self.ngf, 7, name="conv_in")(h)
        h = norm_apply(self.norm, h, train, "norm_in")
        h = jax.nn.relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = make_conv(self.conv_kind, self.ngf * mult * 2, 3, stride=2,
                          padding=1, name=f"down{i}")(h)
            h = norm_apply(self.norm, h, train, f"down{i}_norm")
            h = jax.nn.relu(h)
        dim = self.ngf * 2 ** self.n_downsampling
        h = self._bottleneck(h, dim, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            out_ch = self.ngf * mult // 2
            if self.deconv_kind == "bilinear":
                n, hh, ww, c = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "bilinear")
                h = DepthwiseSeparableConv(out_ch, 3, 1, 1,
                                           name=f"up{i}")(h)
            else:
                w = self.param(f"up{i}_kernel", nn.initializers.he_normal(),
                               (3, 3, h.shape[-1], out_ch))
                b = self.param(f"up{i}_bias", nn.initializers.zeros,
                               (out_ch,))
                h = conv_transpose2d_torch(h, w, b)
            h = norm_apply(self.norm, h, train, f"up{i}_norm")
            h = jax.nn.relu(h)
        h = pad2d(h, 3, "reflect")
        wout = self.param("conv_out_kernel", nn.initializers.he_normal(),
                          (7, 7, h.shape[-1], self.output_nc))
        bout = self.param("conv_out_bias", nn.initializers.zeros,
                          (self.output_nc,))
        h = conv2d(h, wout, bout)
        if self.out_act == "tanh":
            return jnp.tanh(h)
        if self.out_act == "sigmoid":
            return jax.nn.sigmoid(h)
        return h


class GlobalGenerator(_GlobalBase):
    """pix2pixhd.py:341-436 (the lama-regular generator)."""


class MultiDilatedGlobalGenerator(_GlobalBase):
    """pix2pixhd.py:178-237."""
    conv_kind: str = "multidilated"
    block_kind: str = "multidilated"


class ConfigGlobalGenerator(_GlobalBase):
    """pix2pixhd.py:239-326 — the per-instance bottleneck SCHEDULE parser:
    ``manual_block_spec`` is a sequence of spec mappings, each selecting its
    own block kind / conv kind / dilation / count for a run of blocks
    (reference make_and_add_blocks, :292-315). An empty spec falls back to
    ``n_blocks`` of the instance defaults (:282-287: use_default). A spec
    entry may carry:
      n_blocks            — number of blocks in this run (required)
      use_default         — ignore the entry's own kind fields (:294)
      resnet_block_kind   — multidilatedresnetblock | resnetblock |
                            resnetblock5x5 | resnetblockdwdil
      resnet_conv_kind    — conv ctor for the blocks (default | depthwise |
                            multidilated)
      resnet_dilation     — dilation for resnetblockdwdil runs
    """

    manual_block_spec: Tuple = ()
    resnet_block_kind: str = "multidilatedresnetblock"
    resnet_conv_kind: str = "multidilated"
    resnet_dilation: int = 1

    def _bottleneck(self, h, dim: int, train: bool):
        specs = [dict(s) for s in self.manual_block_spec] or [
            {"n_blocks": self.n_blocks, "use_default": True}]
        idx = 0
        for spec in specs:
            if spec.get("use_default"):
                block_kind = self.resnet_block_kind
                conv_kind = self.resnet_conv_kind
                dilation = self.resnet_dilation
            else:
                block_kind = spec.get("resnet_block_kind",
                                      self.resnet_block_kind)
                conv_kind = spec.get("resnet_conv_kind",
                                     self.resnet_conv_kind)
                dilation = spec.get("resnet_dilation", self.resnet_dilation)
                if dilation is None:
                    dilation = self.resnet_dilation
            for _ in range(int(spec["n_blocks"])):
                name = f"block{idx}"
                if block_kind == "multidilatedresnetblock":
                    h = MultidilatedResnetBlock(dim, norm=self.norm,
                                                name=name)(h, train)
                elif block_kind == "resnetblock":
                    h = ResnetBlock(dim, conv_kind=conv_kind, norm=self.norm,
                                    name=name)(h, train)
                elif block_kind == "resnetblock5x5":
                    h = ResnetBlock(dim, kernel=5, conv_kind=conv_kind,
                                    norm=self.norm, name=name)(h, train)
                elif block_kind == "resnetblockdwdil":
                    h = ResnetBlock(dim, conv_kind=conv_kind, norm=self.norm,
                                    dilation=dilation,
                                    second_dilation=dilation,
                                    name=name)(h, train)
                else:
                    raise ValueError(
                        f"unknown resnet_block_kind {block_kind!r}")
                idx += 1
        return h


class GlobalGeneratorFromSuperChannels(nn.Module):
    """pix2pixhd.py:450-561: GlobalGenerator whose per-stage widths come from
    a super-channels schedule instead of ngf·2^i."""

    output_nc: int = 3
    channels: Sequence[int] = (64, 128, 256, 512, 512, 256, 128, 64)
    n_blocks: int = 6
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = list(self.channels)
        h = pad2d(x, 3, "reflect")
        h = make_conv("default", ch[0], 7, name="conv_in")(h)
        h = norm_apply(self.norm, h, train, "norm_in")
        h = jax.nn.relu(h)
        n_down = (len(ch) - 2) // 2
        for i in range(n_down):
            h = make_conv("default", ch[i + 1], 3, stride=2, padding=1,
                          name=f"down{i}")(h)
            h = norm_apply(self.norm, h, train, f"down{i}_norm")
            h = jax.nn.relu(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(ch[n_down], norm=self.norm,
                            name=f"block{i}")(h, train)
        for i in range(n_down):
            out_ch = ch[n_down + 1 + i]
            w = self.param(f"up{i}_kernel", nn.initializers.he_normal(),
                           (3, 3, h.shape[-1], out_ch))
            b = self.param(f"up{i}_bias", nn.initializers.zeros, (out_ch,))
            h = conv_transpose2d_torch(h, w, b)
            h = norm_apply(self.norm, h, train, f"up{i}_norm")
            h = jax.nn.relu(h)
        h = pad2d(h, 3, "reflect")
        wout = self.param("conv_out_kernel", nn.initializers.he_normal(),
                          (7, 7, h.shape[-1], self.output_nc))
        bout = self.param("conv_out_bias", nn.initializers.zeros,
                          (self.output_nc,))
        return jnp.tanh(conv2d(h, wout, bout))


class NLayerDiscriminator(nn.Module):
    """pix2pixhd.py:565-613: returns (score, intermediate activations)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "bn"
    conv_kind: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        h = make_conv(self.conv_kind, self.ndf, 4, stride=2, padding=2,
                      name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = make_conv(self.conv_kind, nf, 4, stride=2, padding=2,
                          name=f"conv{n}")(h)
            h = norm_apply(self.norm, h, train, f"norm{n}")
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = make_conv(self.conv_kind, nf, 4, stride=1, padding=2,
                      name=f"conv{self.n_layers}")(h)
        h = norm_apply(self.norm, h, train, f"norm{self.n_layers}")
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        score = make_conv(self.conv_kind, 1, 4, stride=1, padding=2,
                          name="conv_score")(h)
        return score, feats


class MultidilatedNLayerDiscriminator(NLayerDiscriminator):
    """pix2pixhd.py:616-664."""
    conv_kind: str = "multidilated"


# ---------------------------------------------------------------------------
# LearnableSpatialTransformWrapper (spatial_transform.py:7-40)
# ---------------------------------------------------------------------------

def rotate_image(x: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Differentiable center rotation of an NHWC batch (kornia.rotate
    equivalent): inverse-warp with bilinear sampling."""
    n, h, w, c = x.shape
    a = jnp.deg2rad(angle_deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    yc, xc = ys - cy, xs - cx
    cos, sin = jnp.cos(a), jnp.sin(a)
    src_y = cos * yc + sin * xc + cy
    src_x = -sin * yc + cos * xc + cx
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 2)
    fy = jnp.clip(src_y - y0, 0.0, 1.0)[None, :, :, None]
    fx = jnp.clip(src_x - x0, 0.0, 1.0)[None, :, :, None]
    v00 = x[:, y0, x0]
    v01 = x[:, y0, x0 + 1]
    v10 = x[:, y0 + 1, x0]
    v11 = x[:, y0 + 1, x0 + 1]
    inb = ((src_y >= 0) & (src_y <= h - 1) & (src_x >= 0)
           & (src_x <= w - 1))[None, :, :, None]
    out = ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
           + fy * (1 - fx) * v10 + fy * fx * v11)
    return jnp.where(inb, out, 0.0)


class LearnableSpatialTransformWrapper(nn.Module):
    """Rotate → inner module → rotate back, with a learnable angle
    (reference spatial_transform.py:7-40; pad omitted, rotation exact)."""

    inner: nn.Module
    angle_init: float = 80.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        angle = self.param("angle",
                           lambda k: jnp.asarray(self.angle_init, jnp.float32))
        y = rotate_image(x, angle)
        y = self.inner(y, train) if hasattr(self.inner, "__call__") else y
        return rotate_image(y, -angle)


class SimpleMultiStepGenerator(nn.Module):
    """Cascade of sub-generators, each fed the concat of the original input
    and all previous outputs; returns outputs concatenated newest-first
    (reference base.py SimpleMultiStepGenerator:53-66)."""

    steps: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur = x
        outs = []
        for step in self.steps:
            out = step(cur, train)
            outs.append(out)
            cur = jnp.concatenate([cur, out], axis=-1)
        return jnp.concatenate(outs[::-1], axis=-1)
