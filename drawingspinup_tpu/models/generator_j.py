"""Style-translator model zoo — GeneratorJ, GeneratorJ_RIC, DiscriminatorN_IN,
PerceptualVGG19 (flax / NHWC).

Capability parity with the reference (``3_style_translator/training/models.py``):
  * GeneratorJ (:24-192): conv0(7×7) → 2× stride-2 convs → N resblocks →
    2× (upsample+conv) → skip-concat 7×7 head → optional smoothers → 1×1 →
    optional tanh. Skip connections concat encoder activations AND the input.
  * GeneratorJ_RIC (:200-419): same topology but every conv is a
    rotation-invariant conv — the 3×3 taps are replaced by 8 samples on the
    unit circle rotated by each pixel's polar angle around the image center
    plus the center tap (reference generate_coordinates :551-604 +
    torchvision deform_conv2d). Here that is a STATIC bilinear gather (the
    offsets depend only on pixel position, never on data), so XLA sees plain
    gathers + matmuls — no deformable-conv CUDA kernel needed.
  * DiscriminatorN_IN (:426-474): PatchGAN with instance norm.
  * PerceptualVGG19 (:480-548): VGG19 prefix, features collected at indices
    {0, 3, 5}. ImageNet weights are not shippable here; by default the
    extractor uses a FIXED random init (a documented random-feature
    perceptual loss), and ``load_weights_npz`` can overlay real VGG19
    weights when the user provides them.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.ops.conv import conv2d


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


class ConvBlock(nn.Module):
    """conv → optional norm → optional activation (NHWC)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    norm: Optional[str] = "batch_norm"  # batch_norm | instance_norm | None
    act: Optional[str] = "leaky"        # leaky | relu | None
    # conv compute dtype (params stay f32, f32 matmul accumulation via the
    # conv itself; norm statistics always run f32). bfloat16 halves the
    # activation HBM traffic — the binding cost of the patch-GAN step.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        w = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        y = conv2d(x, w.astype(dt), None if b is None else b.astype(dt),
                   stride=self.stride, padding=self.padding)
        if self.norm == "batch_norm":
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(y.astype(jnp.float32)).astype(dt)
        elif self.norm == "instance_norm":
            y32 = y.astype(jnp.float32)
            mean = y32.mean(axis=(1, 2), keepdims=True)
            var = y32.var(axis=(1, 2), keepdims=True)
            y = ((y32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(dt)
        if self.act == "leaky":
            y = _leaky(y)
        elif self.act == "relu":
            y = jax.nn.relu(y)
        return y


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest ×2 (torch nn.Upsample default mode)."""
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class GeneratorJ(nn.Module):
    """Reference models.py:24-192."""

    filters: Sequence[int] = (32, 64, 128, 128, 128, 64)
    resnet_blocks: int = 7
    use_bias: bool = False
    tanh: bool = True
    append_smoothers: bool = True
    norm: str = "batch_norm"
    dtype: Any = jnp.float32   # activation compute dtype (see ConvBlock)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = x.astype(jnp.dtype(self.dtype))
        ConvBlock_ = partial(ConvBlock, dtype=self.dtype)
        out0 = ConvBlock_(f[0], 7, padding=3, use_bias=self.use_bias,
                         norm=self.norm, act="leaky", name="conv0")(x, train)
        out1 = ConvBlock_(f[1], 3, stride=2, padding=1, use_bias=self.use_bias,
                         norm=self.norm, act="leaky", name="conv1")(out0, train)
        out2 = ConvBlock_(f[2], 3, stride=2, padding=1, use_bias=self.use_bias,
                         norm=self.norm, act="leaky", name="conv2")(out1, train)
        h = out2
        for i in range(self.resnet_blocks):
            # reference block: relu → conv → norm → relu → conv, residual
            t = jax.nn.relu(h)
            t = ConvBlock_(f[2], 3, padding=1, use_bias=self.use_bias,
                          norm=self.norm, act="relu",
                          name=f"res{i}_conv0")(t, train)
            t = ConvBlock_(f[2], 3, padding=1, use_bias=self.use_bias,
                          norm=None, act=None, name=f"res{i}_conv1")(t, train)
            h = t + h
        h = jnp.concatenate([h, out2], axis=-1)
        h = upsample2x(h)
        h = ConvBlock_(f[4], 3, padding=1, use_bias=False, norm=self.norm,
                      act="relu", name="upconv2")(h, train)
        h = jnp.concatenate([h, out1], axis=-1)
        h = upsample2x(h)
        h = ConvBlock_(f[4], 3, padding=1, use_bias=False, norm=self.norm,
                      act="relu", name="upconv1")(h, train)
        h = jnp.concatenate([h, out0, x], axis=-1)
        h = ConvBlock_(f[5], 7, padding=3, use_bias=self.use_bias, norm=None,
                      act="relu", name="conv_11")(h, train)
        if self.append_smoothers:
            h = ConvBlock_(f[5], 3, padding=1, use_bias=self.use_bias,
                          norm=None, act="relu", name="smooth0")(h, train)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="smooth_bn")(
                h.astype(jnp.float32)).astype(jnp.dtype(self.dtype))
            h = ConvBlock_(f[5], 3, padding=1, use_bias=self.use_bias,
                          norm=None, act="relu", name="smooth1")(h, train)
        w = self.param("head_kernel", nn.initializers.he_normal(),
                       (1, 1, h.shape[-1], 3))
        b = self.param("head_bias", nn.initializers.zeros, (3,))
        y = conv2d(h, w.astype(h.dtype), b.astype(h.dtype)).astype(
            jnp.float32)   # f32 at the model boundary (losses, output)
        return jnp.tanh(y) if self.tanh else y


# ---------------------------------------------------------------------------
# rotation-invariant convolution (GeneratorJ_RIC)
# ---------------------------------------------------------------------------

def ric_sample_positions(h: int, w: int) -> np.ndarray:
    """Static (H, W, 9, 2) sampling positions: the 8 non-center 3×3 taps are
    moved onto the unit circle rotated by the pixel's polar angle θ around
    the image center; the center tap stays. (Reference generate_coordinates,
    models.py:551-604.)"""
    rows = np.arange(h, dtype=np.float64)
    cols = np.arange(w, dtype=np.float64)
    cy, cx = h / 2.0 - 0.5, w / 2.0 - 0.5
    dy = rows[:, None] - cy
    dx = cols[None, :] - cx
    theta = np.arctan2(dx, dy) % (2 * np.pi)
    theta = np.round(theta * 1e4) / 1e4
    pos = np.zeros((h, w, 9, 2), np.float64)
    # tap order: row-major 3×3; tap 4 = center; angles advance by π/4 in the
    # order [0,1,2,3,5,6,7,8] (reference channel layout)
    order = [0, 1, 2, 3, None, 4, 5, 6, 7]
    base = np.stack(np.meshgrid(rows, cols, indexing="ij"), axis=-1)
    for tap in range(9):
        if order[tap] is None:
            pos[:, :, tap, 0] = base[..., 0]
            pos[:, :, tap, 1] = base[..., 1]
        else:
            a = theta + order[tap] * (np.pi / 4.0)
            pos[:, :, tap, 0] = base[..., 0] + np.cos(a)
            pos[:, :, tap, 1] = base[..., 1] + np.sin(a)
    return pos.astype(np.float32)


def bilinear_gather(x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """x (N,H,W,C), pos (H,W,2) float → (N,H,W,C) bilinear samples.
    Out-of-bounds reads clamp to the border (zero-pad semantics of
    deform_conv2d differ negligibly at the image rim)."""
    h, w = x.shape[1], x.shape[2]
    py = jnp.clip(pos[..., 0], 0.0, h - 1.0)
    px = jnp.clip(pos[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (py - y0)[None, :, :, None]
    fx = (px - x0)[None, :, :, None]
    v00 = x[:, y0, x0]
    v01 = x[:, y0, x1]
    v10 = x[:, y1, x0]
    v11 = x[:, y1, x1]
    return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
            + fy * (1 - fx) * v10 + fy * fx * v11)


def ric_shift_weights(h: int, w: int) -> np.ndarray:
    """(9 taps, 9 shifts, H, W) float32: per-pixel bilinear weights of each
    rotated tap expressed over the 9 STATIC integer shifts {−1,0,1}².

    Key observation: every rotated tap lands within ±1 px of its pixel, so
    its bilinear sample is a weighted sum of statically shifted copies of
    the tensor — shift-and-multiply on the VPU instead of per-pixel gathers
    (TPU gathers cost ~10 ms per million indices; shifts are free)."""
    pos = ric_sample_positions(h, w)                      # (H, W, 9, 2)
    base = np.stack(np.meshgrid(np.arange(h, dtype=np.float64),
                                np.arange(w, dtype=np.float64),
                                indexing="ij"), axis=-1)
    d = pos.astype(np.float64) - base[:, :, None, :]      # (H, W, 9, 2)
    out = np.zeros((9, 9, h, w), np.float32)
    shifts = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]
    sidx = {s: i for i, s in enumerate(shifts)}
    y0 = np.floor(d[..., 0]).astype(np.int64)             # ∈ {−1, 0}
    x0 = np.floor(d[..., 1]).astype(np.int64)
    fy = d[..., 0] - y0
    fx = d[..., 1] - x0
    for tap in range(9):
        for cy in (0, 1):
            for cx in (0, 1):
                wgt = ((fy[:, :, tap] if cy else 1 - fy[:, :, tap])
                       * (fx[:, :, tap] if cx else 1 - fx[:, :, tap]))
                sy = y0[:, :, tap] + cy                   # ∈ {−1, 0, 1}
                sx = x0[:, :, tap] + cx
                for s, i in sidx.items():
                    m = (sy == s[0]) & (sx == s[1])
                    out[tap, i][m] += wgt[m]
    return out


def ric_shifted_weights(h: int, w: int) -> np.ndarray:
    """(9 shifts, 9 taps, H, W) float32: ``ric_shift_weights`` re-expressed in
    the SHIFTED pixel frame — ``swf[i, t, a, b] = sw[t, i, a−sy_i, b−sx_i]``
    (zero beyond the border).

    With these, the shift-lerp becomes
        y[n,a,b,i,o] = Σ_t swf[i,t,a,b] · z[n,a,b,t,o]
        out          = Σ_i shift2d(y[..., i, :], sy_i, sx_i)
    which is algebraically identical to the per-shift form (each out[h,w]
    contribution i reads y at [h+sy_i, w+sx_i], where swf equals the original
    sw at [h, w]) — but the (N,H,W,9,O)-sized tensors are now written and
    read ONCE per direction. The per-shift form reads z 9× in the forward and
    its transpose accumulates dz nine times in the backward, which measured
    8.6× forward cost for the stage-3 GAN generator gradient (see
    PERF_NOTES.md)."""
    sw = ric_shift_weights(h, w)                          # (9t, 9i, H, W)
    shifts = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]
    swf = np.zeros((9, 9, h, w), np.float32)
    for i, (sy, sx) in enumerate(shifts):
        src = sw[:, i]                                    # (9t, H, W)
        pad = np.pad(src, ((0, 0), (1, 1), (1, 1)))
        swf[i] = pad[:, 1 - sy:1 - sy + h, 1 - sx:1 - sx + w]
    return swf


def shift2d(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Static integer shift with zero fill along dims 1 (H) and 2 (W);
    any rank ≥ 3."""
    pad = [(0, 0)] * x.ndim
    pad[1] = pad[2] = (1, 1)
    padded = jnp.pad(x, pad)
    start = [0] * x.ndim
    start[1], start[2] = 1 + sy, 1 + sx
    return jax.lax.dynamic_slice(padded, start, x.shape)


class RICConv(nn.Module):
    """3×3 rotation-invariant conv (deform_conv2d replacement) as
    shift-and-lerp: per-pixel bilinear tap weights over 9 STATIC shifts.
    Gather-free (see ric_shift_weights).

    Op-count design, two steps (PERF_NOTES.md has the measured history):
      1. the channel matmul commutes with the static shifts
         (shift(x)·Wk = shift(x·Wk), zero fill included), so it runs FIRST
         for all 9 taps in one einsum;
      2. the tap→shift contraction uses ``ric_shifted_weights`` (weights
         re-expressed in the shifted frame), so the output is a sum of 9
         statically shifted SLICES of one contracted tensor. Both einsums
         touch the (N,H,W,9,O) intermediates once per direction; the
         per-shift formulation read them 9× forward and accumulated the
         cotangent 9× backward (measured G-grad 8.6× G-forward)."""

    features: int
    use_bias: bool = False
    # "fused" (1-write/1-read XLA) | "pershift" (9 reads, inference-optimal)
    # | "pallas" (whole chain VMEM-resident, kernels/ric_conv.py)
    variant: str = "fused"

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        wk = self.param("kernel", nn.initializers.he_normal(),
                        (9, x.shape[-1], self.features))
        if self.variant == "pallas":
            from drawingspinup_tpu.kernels.ric_conv import ric_conv
            swf = jnp.asarray(ric_shifted_weights(h, w))
            out = ric_conv(x.astype(jnp.float32), wk.astype(jnp.float32),
                           swf).astype(x.dtype)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.features,))
            return out
        shifts = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]
        z = jnp.einsum("nhwc,tco->nhwto", x, wk.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        out = None
        if self.variant == "fused":
            swf = jnp.asarray(ric_shifted_weights(h, w))  # (9 sh, 9 taps, H, W)
            y = jnp.einsum("nhwto,ithw->nhwio", z, swf.astype(x.dtype),
                           preferred_element_type=jnp.float32).astype(x.dtype)
            for i, (sy, sx) in enumerate(shifts):
                t = shift2d(y[:, :, :, i, :], sy, sx)
                out = t if out is None else out + t
        else:
            sw = jnp.asarray(ric_shift_weights(h, w))     # (9 taps, 9 sh, H, W)
            # per-shift pad+slice (shift2d), NOT one shared padded tensor:
            # XLA fuses each pad/slice into its consumer
            for i, (sy, sx) in enumerate(shifts):
                t = jnp.einsum("nhwto,thw->nhwo", shift2d(z, sy, sx),
                               sw[:, i].astype(x.dtype),
                               preferred_element_type=jnp.float32).astype(x.dtype)
                out = t if out is None else out + t
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


class GeneratorJ_RIC(nn.Module):
    """Reference models.py:200-419: GeneratorJ topology with every conv
    rotation-invariant; downsampling via maxpool (not strided conv)."""

    filters: Sequence[int] = (32, 64, 128, 128, 128, 64)
    resnet_blocks: int = 7
    use_bias: bool = False
    tanh: bool = True
    append_smoothers: bool = True
    ric_variant: str = "fused"   # see RICConv.variant
    dtype: Any = jnp.float32     # activation compute dtype (see ConvBlock)

    def _norm_act(self, y, act, train, name):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name=name)(
            y.astype(jnp.float32)).astype(jnp.dtype(self.dtype))
        return _leaky(y) if act == "leaky" else jax.nn.relu(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = x.astype(jnp.dtype(self.dtype))
        maxpool = partial(nn.max_pool, window_shape=(2, 2), strides=(2, 2))
        out0 = self._norm_act(RICConv(f[0], variant=self.ric_variant, name="conv0")(x), "leaky", train,
                              "bn0")
        out1 = self._norm_act(RICConv(f[1], variant=self.ric_variant, name="conv1")(maxpool(out0)),
                              "leaky", train, "bn1")
        out2 = self._norm_act(RICConv(f[2], variant=self.ric_variant, name="conv2")(maxpool(out1)),
                              "leaky", train, "bn2")
        h = out2
        for i in range(self.resnet_blocks):
            t = jax.nn.relu(h)
            t = RICConv(f[2], variant=self.ric_variant, name=f"res{i}_conv0")(t)
            t = self._norm_act(t, "relu", train, f"res{i}_bn")
            t = RICConv(f[2], variant=self.ric_variant, name=f"res{i}_conv1")(t)
            h = t + h
        h = jnp.concatenate([h, out2], axis=-1)
        h = upsample2x(h)
        h = RICConv(f[4], variant=self.ric_variant, name="upconv2")(h)
        h = self._norm_act(h, "relu", train, "up2_bn")
        h = jnp.concatenate([h, out1], axis=-1)
        h = upsample2x(h)
        h = RICConv(f[4], variant=self.ric_variant, name="upconv1")(h)
        h = self._norm_act(h, "relu", train, "up1_bn")
        h = jnp.concatenate([h, out0, x], axis=-1)
        h = jax.nn.relu(RICConv(f[5], variant=self.ric_variant, name="conv_11")(h))
        if self.append_smoothers:
            t = jax.nn.relu(RICConv(f[5], variant=self.ric_variant, name="smooth0")(h))
            t = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="smooth_bn")(
                t.astype(jnp.float32)).astype(jnp.dtype(self.dtype))
            # NOTE: reference conv_11_a feeds conv index 3 from `output`, not
            # the intermediate (models.py:349-352) — preserved here.
            h = jax.nn.relu(RICConv(f[5], variant=self.ric_variant, name="smooth1")(h))
        wh = self.param("head_kernel", nn.initializers.he_normal(),
                        (1, 1, h.shape[-1], 3))
        bh = self.param("head_bias", nn.initializers.zeros, (3,))
        y = conv2d(h, wh.astype(h.dtype), bh.astype(h.dtype)).astype(
            jnp.float32)   # f32 at the model boundary (losses, output)
        return jnp.tanh(y) if self.tanh else y


class DiscriminatorN_IN(nn.Module):
    """PatchGAN with instance norm (reference models.py:426-474)."""

    num_filters: int = 12
    n_layers: int = 2
    use_bias: bool = True
    dtype: Any = jnp.float32     # activation compute dtype (see ConvBlock)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ConvBlock_ = partial(ConvBlock, dtype=self.dtype)
        h = ConvBlock_(self.num_filters, 4, stride=2, padding=1,
                       use_bias=self.use_bias, norm=None, act="leaky",
                       name="conv0")(x, train)
        mult = 1
        for l in range(1, self.n_layers):
            mult = min(2 ** l, 8)
            h = ConvBlock_(self.num_filters * mult, 4, stride=2, padding=1,
                           use_bias=self.use_bias, norm="instance_norm",
                           act="leaky", name=f"conv_{l}")(h, train)
        mult = min(2 ** self.n_layers, 8)
        h = ConvBlock_(self.num_filters * mult, 4, stride=1, padding=1,
                       use_bias=self.use_bias, norm="instance_norm",
                       act="leaky", name=f"conv_{self.n_layers}")(h, train)
        h = ConvBlock_(1, 4, stride=1, padding=1, use_bias=self.use_bias,
                       norm=None, act=None, name="conv_out")(h, train)
        return h.astype(jnp.float32), None  # f32 logits at the boundary


class PerceptualVGG19(nn.Module):
    """VGG19 prefix feature extractor, outputs at feature indices {0, 3, 5}
    (reference models.py:480-548). Weights default to a fixed random init —
    a random-feature perceptual metric — and can be overlaid with real VGG19
    weights via ``load_weights_npz``."""

    feature_layers: Sequence[int] = (0, 3, 5)
    use_normalization: bool = False
    dtype: Any = jnp.float32     # activation compute dtype (see ConvBlock)

    # VGG19 feature-layer channel plan up to index max(feature_layers)
    _PLAN = [(0, 64), (2, 64), (5, 128), (7, 128)]  # (feature idx, channels)

    @nn.compact
    def __call__(self, x, as_list: bool = False):
        """as_list=True returns the raw NHWC feature maps — the perceptual
        loss only needs per-map squared sums, and the flatten+concat of the
        default path forces tiled-layout relayouts that cost ~20 ms/step on
        TPU (measured; the whole conv stack is ~1 ms)."""
        if self.use_normalization:
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = ((x + 1) / 2 - mean) / std
        outs: List[jnp.ndarray] = []
        idx = 0
        h = x.astype(jnp.dtype(self.dtype))
        max_layer = max(self.feature_layers)
        for conv_i, (feat_idx, ch) in enumerate(self._PLAN):
            if feat_idx > max_layer:
                break
            if feat_idx in (5, 10) and feat_idx != 0:  # pool before conv2_1…
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = ConvBlock(ch, 3, padding=1, use_bias=True, norm=None,
                          act=None, dtype=self.dtype,
                          name=f"vggconv{conv_i}")(h)
            if feat_idx in self.feature_layers:
                outs.append(h)
            h = jax.nn.relu(h)
            if feat_idx + 1 in self.feature_layers:
                outs.append(h)
            if len(outs) == len(self.feature_layers):
                break
        if as_list:
            # f32 at the boundary: the perceptual-loss squared sums
            # accumulate outside any matmul
            return [o.astype(jnp.float32) for o in outs]
        flat = [o.reshape(o.shape[0], -1) for o in outs]
        return jnp.concatenate(flat, axis=-1)


def load_vgg_weights_npz(variables: Dict, npz_path: str) -> Dict:
    """Overlay real VGG19 conv weights (saved as npz with keys
    ``features.N.weight/bias`` in torch OIHW layout) onto the extractor."""
    import flax.traverse_util as tu

    data = np.load(npz_path)
    flat = dict(tu.flatten_dict(variables))
    torch_idx = [0, 2, 5, 7]
    for conv_i, ti in enumerate(torch_idx):
        wkey = f"features.{ti}.weight"
        bkey = f"features.{ti}.bias"
        fk = ("params", f"vggconv{conv_i}", "kernel")
        fb = ("params", f"vggconv{conv_i}", "bias")
        if wkey in data and fk in flat:
            flat[fk] = jnp.asarray(data[wkey].transpose(2, 3, 1, 0))
            flat[fb] = jnp.asarray(data[bkey])
    return tu.unflatten_dict(flat)
