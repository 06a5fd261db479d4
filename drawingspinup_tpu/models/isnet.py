"""IS-Net (DIS) salient-object segmentation in flax — the background-removal
model the reference drives through onnxruntime (``mv.py:17-18`` loads
``dis_pretrained/isnet_dis.onnx``; ``remove_background`` ``mv.py:134-151``
normalizes with mean 0.5 / std 1.0 and takes the first side output).

TPU-native rebuild: NHWC, inference-only (BatchNorm folded to a frozen
affine), all convs static-shape so XLA tiles them onto the MXU. The
architecture is the public IS-Net from "Highly Accurate Dichotomous Image
Segmentation" (Qin et al., ECCV 2022): a U²-Net-style encoder/decoder of
RSU blocks with deep side supervision; at inference only the finest side
map (d1) is used.

Weights: `port_isnet_torch_state` converts an official ``isnet.pth``
checkpoint (torch state_dict layout) to this module's param tree. The onnx
file the reference ships can be converted offline via torch (the official
repo distributes the same weights as .pth); no weights are bundled here —
without a checkpoint, `pipelines.stage2_mv.background_removal` falls back
to its heuristic matte.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class REBNCONV(nn.Module):
    """conv3x3(dilation d, optional stride) + frozen BN + ReLU."""
    out_ch: int
    dirate: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dirate,
                    kernel_dilation=(self.dirate, self.dirate),
                    name="conv")(x)
        # inference-mode BN: y = (x - mean) * scale / sqrt(var+eps) + bias
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, name="bn")(x)
        return jax.nn.relu(x)


def _down(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max pool, ceil mode (official MaxPool2d(2, 2, ceil_mode=True))."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Bilinear upsample x to ref's spatial size."""
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear")


class RSU(nn.Module):
    """Residual U-block of `height` levels (RSU-7 … RSU-4)."""
    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        # encoder
        enc: List[jnp.ndarray] = []
        h = hxin
        for i in range(1, self.height):
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}")(h)
            enc.append(h)
            if i < self.height - 1:
                h = _down(h)
        # bottom (dilated)
        h = REBNCONV(self.mid_ch, dirate=2, name=f"rebnconv{self.height}")(h)
        # decoder
        for i in range(self.height - 1, 0, -1):
            h = REBNCONV(self.out_ch if i == 1 else self.mid_ch,
                         name=f"rebnconv{i}d")(
                jnp.concatenate([h, enc[i - 1]], axis=-1))
            if i > 1:
                h = _up_to(h, enc[i - 2])
        return h + hxin


class RSU4F(nn.Module):
    """Dilation-only RSU (no pooling), dilations 1/2/4/8."""
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, dirate=1, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, dirate=8, name="rebnconv4")(h3)
        h3d = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        h2d = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1))
        h1d = REBNCONV(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1))
        return h1d + hxin


class ISNetDIS(nn.Module):
    """IS-Net encoder/decoder. Returns the 6 sigmoid side maps (finest
    first), each upsampled to the input resolution — inference takes d1."""
    in_ch: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        hxin = REBNCONV(64, stride=2, name="conv_in")(x)

        hx1 = RSU(7, 32, 64, name="stage1")(hxin)
        hx = _down(hx1)
        hx2 = RSU(6, 32, 128, name="stage2")(hx)
        hx = _down(hx2)
        hx3 = RSU(5, 64, 256, name="stage3")(hx)
        hx = _down(hx3)
        hx4 = RSU(4, 128, 512, name="stage4")(hx)
        hx = _down(hx4)
        hx5 = RSU4F(256, 512, name="stage5")(hx)
        hx = _down(hx5)
        hx6 = RSU4F(256, 512, name="stage6")(hx)

        hx5d = RSU4F(256, 512, name="stage5d")(
            jnp.concatenate([_up_to(hx6, hx5), hx5], axis=-1))
        hx4d = RSU(4, 128, 256, name="stage4d")(
            jnp.concatenate([_up_to(hx5d, hx4), hx4], axis=-1))
        hx3d = RSU(5, 64, 128, name="stage3d")(
            jnp.concatenate([_up_to(hx4d, hx3), hx3], axis=-1))
        hx2d = RSU(6, 32, 64, name="stage2d")(
            jnp.concatenate([_up_to(hx3d, hx2), hx2], axis=-1))
        hx1d = RSU(7, 16, 64, name="stage1d")(
            jnp.concatenate([_up_to(hx2d, hx1), hx1], axis=-1))

        sides = []
        for i, h in enumerate([hx1d, hx2d, hx3d, hx4d, hx5d, hx6], 1):
            d = nn.Conv(1, (3, 3), padding=1, name=f"side{i}")(h)
            sides.append(jax.nn.sigmoid(_up_to(d, x)))
        return sides


def isnet_predict(variables: Dict[str, Any], image: np.ndarray) -> np.ndarray:
    """image (H, W, 3) uint8/float [0,255] → saliency mask (H, W) float
    [0,1]. Mirrors the reference preprocessing (mv.py:134-151): /255,
    mean 0.5, std 1.0, finest side output, clipped."""
    im = np.asarray(image, np.float32)
    if im.max() <= 1.0 + 1e-6:
        im = im * 255.0
    im = im / 255.0 - 0.5
    model = ISNetDIS()
    d1 = model.apply(variables, jnp.asarray(im)[None])[0]
    return np.clip(np.asarray(d1)[0, ..., 0], 0.0, 1.0)


# ---------------------------------------------------------------------------
# torch-checkpoint porter
# ---------------------------------------------------------------------------

def _src_names(path: Tuple[str, ...]) -> str:
    """Flax param path → official torch module prefix.

    conv_in/sideN use plain ``.conv``/``.bn`` child names (myrebnconv);
    RSU-internal REBNCONVs use ``conv_s1``/``bn_s1``.
    """
    mod = list(path[:-2])  # drop leaf module ('conv'|'bn') + leaf name
    leaf_mod = path[-2]
    inside_rsu = len(mod) >= 1 and mod[0].startswith("stage")
    if leaf_mod == "conv":
        child = "conv_s1" if inside_rsu else "conv"
    else:
        child = "bn_s1" if inside_rsu else "bn"
    if mod and mod[-1] == "conv_in":  # conv_in is itself the REBNCONV scope
        child = {"conv": "conv", "bn": "bn"}[leaf_mod]
    return ".".join(mod + [child])


def port_isnet_torch_state(state: Dict[str, np.ndarray],
                           variables: Dict[str, Any]) -> Dict[str, Any]:
    """Map an official ISNetDIS torch ``state_dict`` (numpy values) onto
    this module's variables tree ({'params', 'batch_stats'}). Side convs
    (``sideN.weight``) have no BN. Raises KeyError listing unmapped source
    keys so partial ports fail loudly.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    leaf_map = {
        ("conv", "kernel"): (".weight", lambda v: np.transpose(v, (2, 3, 1, 0))),
        ("conv", "bias"): (".bias", lambda v: v),
        ("bn", "scale"): (".weight", lambda v: v),
        ("bn", "bias"): (".bias", lambda v: v),
        ("bn", "mean"): (".running_mean", lambda v: v),
        ("bn", "var"): (".running_var", lambda v: v),
    }
    used = {k for k in state if k.endswith("num_batches_tracked")}
    out = {}
    for coll in ("params", "batch_stats"):
        flat = flatten_dict(variables[coll])
        new = {}
        for path, val in flat.items():
            if path[-2].startswith("side"):  # plain side conv
                src = path[-2] + {"kernel": ".weight", "bias": ".bias"}[path[-1]]
                xf = (lambda v: np.transpose(v, (2, 3, 1, 0))) \
                    if path[-1] == "kernel" else (lambda v: v)
            else:
                suffix, xf = leaf_map[(path[-2], path[-1])]
                src = _src_names(path) + suffix
            if src not in state:
                raise KeyError(f"missing torch key {src} for flax {path}")
            v = xf(np.asarray(state[src]))
            if v.shape != np.asarray(val).shape:
                raise ValueError(f"{src}: shape {v.shape} != {np.asarray(val).shape}")
            new[path] = v
            used.add(src)
        out[coll] = unflatten_dict(new)
    unmapped = sorted(k for k in state if k not in used)
    if unmapped:
        raise KeyError(f"unmapped torch keys: {unmapped[:8]}"
                       f" (+{max(len(unmapped) - 8, 0)} more)")
    return out
