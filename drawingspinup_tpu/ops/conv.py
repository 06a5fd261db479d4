"""Convolution primitives in NHWC layout (TPU-native).

These exist so that reference PyTorch checkpoints port weight-exactly:
``conv2d`` supports reflect padding (torch ``padding_mode='reflect'``) and
``conv_transpose2d_torch`` reproduces ``nn.ConvTranspose2d(k,s,p,op)``
semantics via an input-dilated convolution with a spatially-flipped kernel.

Weight layout convention: HWIO (height, width, in, out) — flax default.
A torch OIHW kernel converts via ``w.transpose(2, 3, 1, 0)``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PadLike = Union[int, Tuple[int, int]]


def _pair(v: PadLike) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


def pad2d(x: jnp.ndarray, pad: PadLike, mode: str = "reflect") -> jnp.ndarray:
    """Pad H and W of an NHWC tensor. mode: reflect | zeros | edge."""
    ph, pw = _pair(pad)
    if ph == 0 and pw == 0:
        return x
    jmode = {"reflect": "reflect", "zeros": "constant", "edge": "edge"}[mode]
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=jmode)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: PadLike = 1, padding: PadLike = 0, dilation: PadLike = 1,
           groups: int = 1, pad_mode: str = "zeros") -> jnp.ndarray:
    """NHWC conv. w: HWIO with I = in_channels // groups."""
    x = pad2d(x, padding, mode=pad_mode) if pad_mode != "zeros" else x
    pad_spec: Union[str, Sequence[Tuple[int, int]]]
    if pad_mode == "zeros":
        ph, pw = _pair(padding)
        pad_spec = ((ph, ph), (pw, pw))
    else:
        pad_spec = ((0, 0), (0, 0))
    # params live in f32; compute follows the activation dtype (bf16 policy)
    w = w.astype(x.dtype)
    b = b.astype(x.dtype) if b is not None else None
    out = lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=pad_spec,
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose2d_torch(x: jnp.ndarray, w: jnp.ndarray,
                           b: Optional[jnp.ndarray] = None, stride: int = 2,
                           padding: int = 1, output_padding: int = 1) -> jnp.ndarray:
    """Exact ``torch.nn.ConvTranspose2d`` semantics in NHWC.

    torch ConvT(k, s, p, op) == conv of the s-dilated input with the spatially
    flipped kernel, padded (k-1-p) low / (k-1-p+op) high.
    w: HWIO with I = in_channels, O = out_channels (already transposed from
    torch's (in, out, kh, kw) via ``w.transpose(2, 3, 0, 1)`` then flipped —
    this function takes the UNFLIPPED torch-order kernel and flips internally).
    """
    kh, kw = w.shape[0], w.shape[1]
    w = w.astype(x.dtype)
    b = b.astype(x.dtype) if b is not None else None
    w_flip = w[::-1, ::-1, :, :]
    lo_h, hi_h = kh - 1 - padding, kh - 1 - padding + output_padding
    lo_w, hi_w = kw - 1 - padding, kw - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1),
        padding=((lo_h, hi_h), (lo_w, hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC average pool (torch AvgPool2d equivalent, count_include_pad)."""
    out = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / (window * window)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC → (N,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
