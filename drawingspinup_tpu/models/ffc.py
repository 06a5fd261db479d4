"""Fast Fourier Convolution (FFC) model family — TPU-native flax rebuild.

Capability parity with the reference LaMa contour remover's module zoo
(``1_lama_contour_remover/saicinpainting/training/modules/ffc.py``):
FourierUnit (:48-112), SpectralTransform (:115-162), FFC 4-path block
(:165-224), FFC_BN_ACT (:227-254), FFCResnetBlock (:257-291),
FFCResNetGenerator (:304-366), FFCNLayerDiscriminator (:369-432).

TPU-first design decisions (not a port):
  * NHWC layout throughout — XLA's native conv layout on TPU.
  * The spectral path is rFFT2 → a single channel-space matmul over the
    interleaved (re,im) channels → irFFT2. The 1×1 frequency-domain conv is
    expressed as a dense matmul so it tiles straight onto the MXU; XLA fuses
    the BN + ReLU into it.
  * Local/global streams travel as an ``(x_l, x_g)`` tuple where an absent
    stream is ``None`` (static Python structure → no traced conditionals).
  * Channel interleaving of (re,im) matches the torch flatten order, so
    reference checkpoints port weight-for-weight (see utils/torch_port.py).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from drawingspinup_tpu.ops.conv import (
    avg_pool2d, conv2d, conv_transpose2d_torch, global_avg_pool, pad2d,
)
from drawingspinup_tpu.ops.fourier import irfft2_ortho, rfft2_ortho

Stream = Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]


def _act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "relu": jax.nn.relu,
        "leaky_relu_0.2": lambda x: jax.nn.leaky_relu(x, 0.2),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "identity": lambda x: x,
    }[name]


class Conv(nn.Module):
    """NHWC conv with optional reflect padding; weight layout HWIO."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"  # zeros | reflect

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, in_ch // self.groups, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return conv2d(x, w, b, stride=self.stride, padding=self.padding,
                      dilation=self.dilation, groups=self.groups,
                      pad_mode=self.pad_mode)


class ConvTransposeTorch(nn.Module):
    """torch-semantics ConvTranspose2d(k=3, s=2, p=1, op=1): exact ×2 upsample."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, self.kernel, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose2d_torch(x, w, b, stride=self.stride,
                                      padding=self.padding,
                                      output_padding=self.output_padding)


class BatchNorm(nn.Module):
    """BatchNorm2d over NHWC with torch-compatible defaults."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ura = (not train) if self.use_running_average is None \
            else self.use_running_average
        return nn.BatchNorm(use_running_average=ura, momentum=0.9,
                            epsilon=1e-5, axis=-1, dtype=x.dtype)(x)


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference squeeze_excitation.py:4-20)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        y = global_avg_pool(x)
        y = nn.Dense(ch // self.reduction, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(ch, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y


class FourierUnit(nn.Module):
    """rFFT2 → 1×1 conv (+BN+ReLU) on interleaved (re,im) channels → irFFT2.

    Reference ffc.py:48-112. The frequency-domain conv is a channel matmul
    (MXU); FFTs run in float32 for accuracy regardless of compute dtype.
    """

    features: int
    groups: int = 1
    spectral_pos_encoding: bool = False
    use_se: bool = False
    fft_norm: str = "ortho"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, h, w, c = x.shape
        dtype = x.dtype
        # DFT-as-matmul on the MXU (ops/fourier.py) — XLA's FFT op is not
        # viable on TPU at these sizes (and absent on this backend).
        x_re, x_im = rfft2_ortho(x.astype(jnp.float32))
        # (N, H, Wf, C) re/im → (N, H, Wf, 2C) interleaved [c0_re, c0_im, ...]
        ff = jnp.stack([x_re, x_im], axis=-1)
        ff = ff.reshape(n, h, w // 2 + 1, c * 2).astype(dtype)

        if self.spectral_pos_encoding:
            hh, ww = ff.shape[1], ff.shape[2]
            cv = jnp.broadcast_to(jnp.linspace(0, 1, hh, dtype=dtype)[None, :, None, None],
                                  (n, hh, ww, 1))
            ch_ = jnp.broadcast_to(jnp.linspace(0, 1, ww, dtype=dtype)[None, None, :, None],
                                   (n, hh, ww, 1))
            ff = jnp.concatenate([cv, ch_, ff], axis=-1)

        if self.use_se:
            ff = SELayer(name="se")(ff)

        ff = Conv(self.features * 2, kernel=1, groups=self.groups,
                  use_bias=False, name="conv")(ff)
        ff = BatchNorm(name="bn")(ff, train=train)
        ff = jax.nn.relu(ff)

        ff = ff.reshape(n, h, w // 2 + 1, self.features, 2).astype(jnp.float32)
        y = irfft2_ortho(ff[..., 0], ff[..., 1], (h, w))
        return y.astype(dtype)


class SpectralTransform(nn.Module):
    """Reference ffc.py:115-162."""

    features: int
    stride: int = 1
    groups: int = 1
    enable_lfu: bool = True
    fu_kwargs: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.stride == 2:
            x = avg_pool2d(x, 2, 2)
        half = self.features // 2
        x = Conv(half, kernel=1, groups=self.groups, use_bias=False,
                 name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train=train)
        x = jax.nn.relu(x)
        fu_kwargs = dict(self.fu_kwargs or {})
        out = FourierUnit(half, groups=self.groups, name="fu", **fu_kwargs)(
            x, train=train)

        if self.enable_lfu:
            n, h, w, c = x.shape
            s = h // 2
            # 2×2 spatial split of the first quarter channels, stacked on C
            xs = x[..., : c // 4]
            xs = jnp.concatenate([xs[:, :s], xs[:, s:2 * s]], axis=-1)
            xs = jnp.concatenate([xs[:, :, :s], xs[:, :, s:2 * s]], axis=-1)
            xs = FourierUnit(half, groups=self.groups, name="lfu")(xs, train=train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
            out = out + xs

        y = Conv(self.features, kernel=1, groups=self.groups, use_bias=False,
                 name="conv2")(x + out)
        return y


class FFC(nn.Module):
    """Two-stream (local/global) convolution block, reference ffc.py:165-224."""

    features: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    enable_lfu: bool = True
    padding_type: str = "reflect"
    gated: bool = False
    fu_kwargs: Any = None

    @nn.compact
    def __call__(self, x: Stream, train: bool = False) -> Stream:
        x_l, x_g = x
        in_cl = x_l.shape[-1] if x_l is not None else 0
        in_cg = x_g.shape[-1] if x_g is not None else 0
        out_cg = int(self.features * self.ratio_gout)
        out_cl = self.features - out_cg

        def mk_conv(name: str, ch: int) -> Conv:
            return Conv(ch, kernel=self.kernel, stride=self.stride,
                        padding=self.padding, dilation=self.dilation,
                        groups=self.groups, use_bias=self.use_bias,
                        pad_mode=self.padding_type if self.padding else "zeros",
                        name=name)

        g2l_gate = l2g_gate = None
        if self.gated and in_cg > 0 and out_cl > 0:
            total = jnp.concatenate(
                [t for t in (x_l, x_g) if t is not None], axis=-1)
            gates = jax.nn.sigmoid(Conv(2, kernel=1, name="gate")(total))
            g2l_gate, l2g_gate = gates[..., :1], gates[..., 1:]

        out_l = out_g = None
        if out_cl > 0:
            terms = []
            if in_cl > 0:
                terms.append(mk_conv("convl2l", out_cl)(x_l))
            if in_cg > 0:
                t = mk_conv("convg2l", out_cl)(x_g)
                terms.append(t * g2l_gate if g2l_gate is not None else t)
            out_l = sum(terms[1:], terms[0]) if terms else None
        if out_cg > 0:
            terms = []
            if in_cl > 0:
                t = mk_conv("convl2g", out_cg)(x_l)
                terms.append(t * l2g_gate if l2g_gate is not None else t)
            if in_cg > 0:
                terms.append(SpectralTransform(
                    out_cg, stride=self.stride,
                    groups=1 if self.groups == 1 else self.groups // 2,
                    enable_lfu=self.enable_lfu, fu_kwargs=self.fu_kwargs,
                    name="convg2g")(x_g, train=train))
            out_g = sum(terms[1:], terms[0]) if terms else None
        return out_l, out_g


class FFCBnAct(nn.Module):
    """FFC followed by per-stream BN + activation (reference ffc.py:227-254)."""

    features: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    activation: str = "identity"
    enable_lfu: bool = True
    padding_type: str = "reflect"
    gated: bool = False
    fu_kwargs: Any = None

    @nn.compact
    def __call__(self, x: Stream, train: bool = False) -> Stream:
        x_l, x_g = FFC(self.features, self.kernel, self.ratio_gin,
                       self.ratio_gout, stride=self.stride, padding=self.padding,
                       dilation=self.dilation, enable_lfu=self.enable_lfu,
                       padding_type=self.padding_type, gated=self.gated,
                       fu_kwargs=self.fu_kwargs, name="ffc")(x, train=train)
        act = _act(self.activation)
        if x_l is not None:
            x_l = act(BatchNorm(name="bn_l")(x_l, train=train))
        if x_g is not None:
            x_g = act(BatchNorm(name="bn_g")(x_g, train=train))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Residual pair of 3×3 FFCBnAct (reference ffc.py:257-291)."""

    dim: int
    ratio_gin: float
    ratio_gout: float
    dilation: int = 1
    activation: str = "relu"
    enable_lfu: bool = True
    padding_type: str = "reflect"
    inline: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.inline:
            g = int(self.dim * self.ratio_gin)
            x_l, x_g = x[..., : self.dim - g], x[..., self.dim - g:]
        else:
            x_l, x_g = x
        id_l, id_g = x_l, x_g
        for name in ("conv1", "conv2"):
            x_l, x_g = FFCBnAct(
                self.dim, kernel=3, ratio_gin=self.ratio_gin,
                ratio_gout=self.ratio_gout, padding=self.dilation,
                dilation=self.dilation, activation=self.activation,
                enable_lfu=self.enable_lfu, padding_type=self.padding_type,
                name=name)((x_l, x_g), train=train)
        x_l = id_l + x_l if (id_l is not None and x_l is not None) \
            else (x_l if x_l is not None else id_l)
        x_g = id_g + x_g if (id_g is not None and x_g is not None) \
            else (x_g if x_g is not None else id_g)
        if self.inline:
            return jnp.concatenate([t for t in (x_l, x_g) if t is not None], axis=-1)
        return x_l, x_g


def concat_stream(x: Stream) -> jnp.ndarray:
    parts = [t for t in x if t is not None]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


class FFCResNetGenerator(nn.Module):
    """The LaMa generator (reference ffc.py:304-366): ReflectPad+FFC 7×7 →
    n stride-2 FFC downsamples → n_blocks FFC residual blocks → ConvTranspose
    upsamples → 7×7 conv head → optional output activation.

    Configured exactly by the reference's generator kwargs
    (``configs/prediction/lama-fourier.yaml:4-23``).
    """

    output_nc: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    max_features: int = 1024
    init_ratio_gin: float = 0.0
    init_ratio_gout: float = 0.0
    down_ratio_gin: float = 0.0
    down_ratio_gout: float = 0.0
    resnet_ratio: float = 0.75
    enable_lfu: bool = False
    add_out_act: str = "sigmoid"
    out_ffc: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # init 7×7 (reflect pad 3); input split by init_ratio_gin
        gin = int(x.shape[-1] * self.init_ratio_gin)
        h: Stream = (x, None) if gin == 0 else (x[..., :-gin], x[..., -gin:])
        h = FFCBnAct(self.ngf, kernel=7, ratio_gin=self.init_ratio_gin,
                     ratio_gout=self.init_ratio_gout, padding=3,
                     activation="relu", enable_lfu=self.enable_lfu,
                     name="init")(h, train=train)
        # downsampling (the input split is inferred from the stream shapes;
        # the last downsample switches its global ratio to the resnet ratio,
        # mirroring reference ffc.py:320-323)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            feats = min(self.max_features, self.ngf * mult * 2)
            gout = (self.resnet_ratio if i == self.n_downsampling - 1
                    else self.down_ratio_gout)
            h = FFCBnAct(feats, kernel=3, ratio_gin=self.down_ratio_gin,
                         ratio_gout=gout, stride=2, padding=1,
                         activation="relu", enable_lfu=self.enable_lfu,
                         name=f"down{i}")(h, train=train)
        # bottleneck residual blocks
        feats = min(self.max_features, self.ngf * 2 ** self.n_downsampling)
        for i in range(self.n_blocks):
            h = FFCResnetBlock(feats, ratio_gin=self.resnet_ratio,
                               ratio_gout=self.resnet_ratio,
                               enable_lfu=self.enable_lfu,
                               name=f"block{i}")(h, train=train)
        y = concat_stream(h)
        # upsampling
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            feats = min(self.max_features, int(self.ngf * mult / 2))
            y = ConvTransposeTorch(feats, name=f"up{i}")(y)
            y = BatchNorm(name=f"up{i}_bn")(y, train=train)
            y = jax.nn.relu(y)
        if self.out_ffc:
            y = FFCResnetBlock(self.ngf, ratio_gin=self.resnet_ratio,
                               ratio_gout=self.resnet_ratio, inline=True,
                               enable_lfu=self.enable_lfu,
                               name="out_ffc_block")(y, train=train)
        y = pad2d(y, 3, mode="reflect")
        y = Conv(self.output_nc, kernel=7, name="head")(y)
        if self.add_out_act and self.add_out_act != "none":
            y = _act(self.add_out_act)(y)
        return y


class FFCNLayerDiscriminator(nn.Module):
    """PatchGAN-style FFC discriminator returning (score, feature list)
    (reference ffc.py:369-432)."""

    ndf: int = 64
    n_layers: int = 3
    max_features: int = 512
    init_ratio_gin: float = 0.0
    init_ratio_gout: float = 0.0
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    enable_lfu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = []
        h: Stream = (x, None)
        h = FFCBnAct(self.ndf, kernel=3, ratio_gin=self.init_ratio_gin,
                     ratio_gout=self.init_ratio_gout, padding=1,
                     activation="leaky_relu_0.2", enable_lfu=self.enable_lfu,
                     name="model0")(h, train=train)
        feats.append(concat_stream(h))
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, self.max_features)
            h = FFCBnAct(nf, kernel=3, stride=2, padding=1,
                         ratio_gin=self.ratio_gin, ratio_gout=self.ratio_gout,
                         activation="leaky_relu_0.2",
                         enable_lfu=self.enable_lfu,
                         name=f"model{n}")(h, train=train)
            feats.append(concat_stream(h))
        nf = min(nf * 2, 512)
        h = FFCBnAct(nf, kernel=3, stride=1, padding=1,
                     ratio_gin=self.ratio_gin, ratio_gout=self.ratio_gout,
                     activation="leaky_relu_0.2", enable_lfu=self.enable_lfu,
                     name=f"model{self.n_layers}")(
            h, train=train)
        y = concat_stream(h)
        feats.append(y)
        score = Conv(1, kernel=3, padding=1, name=f"model{self.n_layers + 1}")(y)
        return score, feats
