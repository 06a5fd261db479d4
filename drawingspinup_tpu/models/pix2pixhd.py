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
        bd = self.param("depthwise_bias", nn.initializers.zeros, (in_ch,))
        x = conv2d(x, wd, bd, stride=self.stride, padding=self.padding,
                   groups=in_ch)
        wp = self.param("pointwise", nn.initializers.he_normal(),
                        (1, 1, in_ch, self.features))
        bp = self.param("pointwise_bias", nn.initializers.zeros,
                        (self.features,))
        return conv2d(x, wp, bp)


class MultiDilatedConv(nn.Module):
    """multidilated_conv.py:6-98: ``dilation_num`` parallel convs of dilation
    ``min_dilation·2^i``, combined per ``comb_mode``:

      * ``sum`` (the reference DEFAULT): every branch maps to the full
        ``features`` width and the branch outputs are summed (:32-34, :97).
      * ``cat_out`` (equal_dim): each branch produces ``features/num``
        channels; the concat is re-ordered by the reference's interleave
        index ``[i + j·(out/num) …]`` so output channel k cycles through
        the branches (:15-18, :95-96).

    Per-branch padding is ``padding·dilation`` (or an explicit per-branch
    sequence, as MultidilatedNLayerDiscriminator's ``padding=[2, 3]``),
    applied with ``padding_mode`` ('zeros' like nn.Conv2d's default, or
    'reflect' as MultidilatedResnetBlock passes via padding_mode=reflect)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation_num: int = 3
    comb_mode: str = "sum"          # sum | cat_out
    min_dilation: int = 1
    padding: Any = 1                # int (scaled by dilation) or per-branch seq
    padding_mode: str = "zeros"     # zeros | reflect

    @nn.compact
    def __call__(self, x):
        if self.comb_mode not in ("sum", "cat_out"):
            raise NotImplementedError(
                f"comb_mode {self.comb_mode!r} (cat_in/cat_both are unused "
                "by every reference config)")
        n = self.dilation_num
        if self.comb_mode == "cat_out":
            assert self.features % n == 0, "equal_dim cat_out needs n | out"
            out_dims = [self.features // n] * n
        else:
            out_dims = [self.features] * n
        outs = []
        d = self.min_dilation
        for i in range(n):
            pad = (int(self.padding[i]) if isinstance(self.padding,
                                                      (tuple, list))
                   else int(self.padding) * d)
            w = self.param(f"kernel{i}", nn.initializers.he_normal(),
                           (self.kernel, self.kernel, x.shape[-1],
                            out_dims[i]))
            b = self.param(f"bias{i}", nn.initializers.zeros, (out_dims[i],))
            if pad:
                xp = (pad2d(x, pad, "reflect")
                      if self.padding_mode == "reflect"
                      else jnp.pad(x, ((0, 0), (pad, pad), (pad, pad),
                                       (0, 0))))
            else:
                xp = x
            outs.append(conv2d(xp, w, b, stride=self.stride, dilation=d))
            d *= 2
        if self.comb_mode == "sum":
            out = outs[0]
            for o in outs[1:]:
                out = out + o
            return out
        cat = jnp.concatenate(outs, axis=-1)
        per = self.features // n
        index = np.asarray([i + j * per for i in range(per)
                            for j in range(n)])
        return cat[..., index]


def make_conv(kind: str, features: int, kernel: int = 3, stride: int = 1,
              padding: int = 0, name: str = "conv"):
    """get_conv_block_ctor equivalent (base.py:21-31)."""
    if kind == "depthwise":
        return DepthwiseSeparableConv(features, kernel, stride, padding,
                                      name=name)
    if kind == "multidilated":
        return MultiDilatedConv(features, kernel, stride=stride,
                                padding=padding, name=name)

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
    in_dim: Optional[int] = None   # ≠None → 1×1 input_conv on the skip
                                   # (reference :54-58, SuperChannels groups)

    def _conv(self, h, d: int, name: str):
        p = d * (self.kernel // 2)
        if self.conv_kind == "multidilated":
            # per-branch SAME (padding k//2 is scaled by each branch's
            # dilation inside MultiDilatedConv); no external pad. (The
            # reference crashes on this combination — duplicate dilation
            # kwarg — so SAME zero-pad is our repair, matching this class's
            # pre-rework behavior.)
            return MultiDilatedConv(self.dim, self.kernel,
                                    padding=self.kernel // 2, name=name)(h)
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
        skip = x
        if self.in_dim is not None:
            wi = self.param("input_conv_kernel", nn.initializers.he_normal(),
                            (1, 1, self.in_dim, self.dim))
            bi = self.param("input_conv_bias", nn.initializers.zeros,
                            (self.dim,))
            skip = conv2d(x, wi, bi)
        return skip + h


class MultidilatedResnetBlock(nn.Module):
    """pix2pixhd.py:60-75 — two MultidilatedConvs (reference passes
    padding_mode=padding_type, i.e. reflect, and the default comb_mode=sum)
    around a residual add."""

    dim: int
    norm: str = "bn"
    comb_mode: str = "sum"
    dilation_num: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = MultiDilatedConv(self.dim, comb_mode=self.comb_mode,
                             dilation_num=self.dilation_num,
                             padding_mode="reflect", name="conv1")(x)
        h = norm_apply(self.norm, h, train, "norm1")
        h = jax.nn.relu(h)
        h = MultiDilatedConv(self.dim, comb_mode=self.comb_mode,
                             dilation_num=self.dilation_num,
                             padding_mode="reflect", name="conv2")(h)
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
            # per-branch SAME padding (7//2=3, dilation-scaled internally)
            h = MultiDilatedConv(self.ngf, 7, padding=3, name="conv_in")(x)
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
    """pix2pixhd.py:178-237 — stem/downsample/upsample use the DEFAULT conv
    ctor (reference conv_kind='default', :190); only the bottleneck resnet
    blocks are multidilated (:218-224, resnet_conv_layer hard-wired to
    'multidilated')."""
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


def convert_super_channels(super_channels: Sequence[int],
                           n_downsampling: int) -> list:
    """Reference convert_super_channels (pix2pixhd.py:500-538): expands a
    super-channels schedule into the flat per-stage channel list. Mirrors the
    index arithmetic exactly — including the upsample entries' ``int(·)``
    truncation and the fact that a 6-entry schedule indexes past its end on
    the third upsample entry (a latent reference bug; such schedules raise
    here the way they raise there)."""
    sc = list(super_channels)
    if n_downsampling == 2:
        n1 = 10
    elif n_downsampling == 3:
        n1 = 13
    else:
        raise NotImplementedError(f"n_downsampling={n_downsampling}")
    result = []
    cnt = 0
    for i in range(n1):
        if i in (1, 4, 7, 10):
            result.append(sc[cnt] * (2 ** cnt))
            cnt += 1
    for i in range(3):
        result.append(sc[3] * 4 if len(sc) == 6 else sc[i + 3] * 4)
    cnt = 2
    for i in range(n1 + 9, n1 + 21):
        if i in (22, 25, 28):
            cnt -= 1
            ch = (sc[5 - cnt] * (2 ** cnt) if len(sc) == 6
                  else sc[7 - cnt] * (2 ** cnt))
            result.append(int(ch))
    return result


class GlobalGeneratorFromSuperChannels(nn.Module):
    """pix2pixhd.py:450-561: GlobalGenerator whose per-stage widths come from
    a super-channels schedule (convert_super_channels), with the bottleneck
    split into three groups of n_blocks//3 / n_blocks//3 / remainder blocks;
    the first block of groups 2 and 3 carries a 1×1 input_conv on its skip
    when the group changes width (reference :481-495). With BatchNorm,
    stem/down/up convs have no bias (use_bias gate, :457-461)."""

    output_nc: int = 3
    super_channels: Sequence[int] = (8, 16, 32, 64, 64, 64, 128, 64, 96)
    n_downsampling: int = 3
    n_blocks: int = 6
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = convert_super_channels(self.super_channels, self.n_downsampling)
        nd = self.n_downsampling
        use_bias = self.norm == "in"

        def conv(h, features, kernel, stride, pad, name):
            w = self.param(f"{name}_kernel", nn.initializers.he_normal(),
                           (kernel, kernel, h.shape[-1], features))
            b = (self.param(f"{name}_bias", nn.initializers.zeros,
                            (features,)) if use_bias else None)
            return conv2d(h, w, b, stride=stride, padding=pad)

        h = pad2d(x, 3, "reflect")
        h = conv(h, ch[0], 7, 1, 0, "conv_in")
        h = norm_apply(self.norm, h, train, "norm_in")
        h = jax.nn.relu(h)
        for i in range(nd):
            h = conv(h, ch[1 + i], 3, 2, 1, f"down{i}")
            h = norm_apply(self.norm, h, train, f"down{i}_norm")
            h = jax.nn.relu(h)

        n1 = self.n_blocks // 3
        n2 = n1
        n3 = self.n_blocks - n1 - n2
        idx = 0
        for i in range(n1):
            h = ResnetBlock(ch[nd], norm=self.norm,
                            name=f"block{idx}")(h, train)
            idx += 1
        for i in range(n2):
            in_dim = ch[nd] if i == 0 else None
            h = ResnetBlock(ch[nd + 1], norm=self.norm, in_dim=in_dim,
                            name=f"block{idx}")(h, train)
            idx += 1
        for i in range(n3):
            in_dim = ch[nd + 1] if i == 0 else None
            h = ResnetBlock(ch[nd + 2], norm=self.norm, in_dim=in_dim,
                            name=f"block{idx}")(h, train)
            idx += 1

        for i in range(nd):
            out_ch = ch[nd + 3 + i + 1]
            w = self.param(f"up{i}_kernel", nn.initializers.he_normal(),
                           (3, 3, h.shape[-1], out_ch))
            b = (self.param(f"up{i}_bias", nn.initializers.zeros,
                            (out_ch,)) if use_bias else None)
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
    middle_kind: str = "default"    # conv ctor for the stride-2 layers 1..L-1
    # 1 = the only runnable configuration of the reference's multidilated
    # variant (its hard-coded padding=[2,3] is spatially inconsistent for
    # dilation_num >= 2 and crashes there on the branch sum)
    dilation_num: int = 1

    def _middle(self, h, nf: int, name: str):
        if self.middle_kind == "multidilated":
            # reference :641: MultidilatedConv(..., kernel_size=4, stride=2,
            # padding=[2, 3]) — explicit per-branch paddings, so only the
            # 2-branch configuration is realizable (the reference default
            # dilation_num=3 would index past its 2-entry padding list)
            return MultiDilatedConv(nf, 4, stride=2, padding=(2, 3),
                                    dilation_num=self.dilation_num,
                                    name=name)(h)
        return make_conv(self.middle_kind, nf, 4, stride=2, padding=2,
                         name=name)(h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        h = make_conv("default", self.ndf, 4, stride=2, padding=2,
                      name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = self._middle(h, nf, f"conv{n}")
            h = norm_apply(self.norm, h, train, f"norm{n}")
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = make_conv("default", nf, 4, stride=1, padding=2,
                      name=f"conv{self.n_layers}")(h)
        h = norm_apply(self.norm, h, train, f"norm{self.n_layers}")
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        score = make_conv("default", 1, 4, stride=1, padding=2,
                          name="conv_score")(h)
        return score, feats


class MultidilatedNLayerDiscriminator(NLayerDiscriminator):
    """pix2pixhd.py:616-664 — only the middle stride-2 layers are
    multidilated; conv0, the stride-1 layer and the score head stay plain
    (reference :628-655)."""
    middle_kind: str = "multidilated"


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
