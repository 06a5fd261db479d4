"""Stage-3 data: keyframe pair loading + on-device patch sampling.

Parity with the reference (``3_style_translator/training/data.py`` +
``custom_transforms.py``):
  * training pair = rendered rest-pose keyframe 0001.png (pre) vs the
    character drawing (post: ``char/<post_name>.png`` with the render's alpha,
    composited on white), both normalized to [-1, 1].
  * pre features = RGB (+ mask channel) (+ pos x,y channels).
  * stage-2 'edge' mode: black edge pixels overlaid on color, then the image
    is concatenated side-by-side with a 90°-rotated alpha-composited copy
    (cat_img/overlap_img augmentation).
  * patches: ``patch_size``² windows centered on valid pixels (mask dilated
    by MaxFilter(7)), plus an independent random GT patch for the
    discriminator.

TPU redesign: the full keyframe tensors live on device; each jitted train
step gathers its 40-patch batch with ``lax.dynamic_slice`` from random valid
midpoints — no per-step host→device traffic.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.core.io import read_image


def normalize(img: np.ndarray) -> np.ndarray:
    """[0,1] → [-1,1] (transforms.Normalize(0.5, 0.5))."""
    return img * 2.0 - 1.0


def overlap_edge_on_img(edge: np.ndarray, rgba: np.ndarray) -> np.ndarray:
    """Black out edge pixels (edge<1.0 treated as edge) and set their alpha
    (reference overlap_edge_on_img)."""
    out = rgba.copy()
    em = edge[..., 0] < 1.0 if edge.ndim == 3 else edge < 1.0
    out[em, 0:3] = 0.0
    out[em, 3] = 1.0
    return out


def overlap_rotated(rgba: np.ndarray) -> np.ndarray:
    """Composite a 90°-clockwise-rotated copy under the image (reference
    overlap_img)."""
    rot = np.rot90(rgba, k=-1).copy()
    a1 = rgba[..., 3:4]
    a2 = rot[..., 3:4]
    rgb = a1 * rgba[..., :3] + a2 * rot[..., :3] * (1 - a1)
    alpha = a1 + a2 * (1 - a1)
    return np.concatenate([rgb, alpha], axis=-1)


def cat_with_rotated(rgba: np.ndarray) -> np.ndarray:
    """[img | rotated-overlap(img)] side by side (reference cat_img)."""
    return np.concatenate([rgba, overlap_rotated(rgba)], axis=1)


def cat_mask_with_rotated(mask: np.ndarray) -> np.ndarray:
    rot = np.rot90(mask, k=-1).copy()
    return np.concatenate([mask, np.maximum(mask, rot)], axis=1)


class KeyframeData(NamedTuple):
    pre: jnp.ndarray        # (H, W, C) normalized input features
    post: jnp.ndarray       # (H, W, 3) normalized target
    mask: jnp.ndarray       # (H, W) [0,1]
    valid_yx: jnp.ndarray   # (N, 2) int32 valid midpoints (may be
                            # bucket-padded — see n_valid)
    # real midpoint count when valid_yx is padded to a shape bucket
    # (a TRACED sampling bound, so every uid of a sweep shares ONE compiled
    # train program instead of retracing per distinct N); None = use
    # valid_yx.shape[0] (unpadded constructors, tests, benches)
    n_valid: Optional[jnp.ndarray] = None


def load_keyframe_pair(action_dir: str, pre_dir: str, post_path: str,
                       use_mask: bool = True, use_pos: bool = True,
                       use_edge: bool = False,
                       frame: str = "0001.png") -> KeyframeData:
    pre_rgba = read_image(os.path.join(action_dir, pre_dir, frame))
    if pre_rgba.shape[-1] == 3:
        pre_rgba = np.concatenate(
            [pre_rgba, np.ones_like(pre_rgba[..., :1])], axis=-1)
    mask = pre_rgba[..., 3]
    post = read_image(post_path)
    if post.shape[-1] == 3:
        post = np.concatenate([post, np.ones_like(post[..., :1])], axis=-1)
    if post.shape[:2] != mask.shape:
        # the reference assumes drawing and render share 512²; when the
        # auto-camera grew the render, rescale the drawing to match
        from PIL import Image
        a = (np.clip(post, 0, 1) * 255).astype(np.uint8)
        post = np.asarray(Image.fromarray(a).resize(
            (mask.shape[1], mask.shape[0]), Image.LANCZOS),
            np.float32) / 255.0
    post = post.copy()
    post[..., 3] = mask  # replace_alpha

    pos = None
    if use_pos:
        # keep the pos PNG's REAL alpha: the edge-overlay augmentation
        # alpha-composites the rotated copy (reference custom_transforms
        # cat_img → overlap_img uses img[..., 3]), so a forced alpha=1
        # would freeze the right half's pos at the un-rotated values
        pos = read_image(os.path.join(action_dir, "pos", frame))
        if pos.shape[-1] == 3:
            pos = np.concatenate([pos, np.ones_like(pos[..., :1])], -1)
    if use_edge:
        edge = read_image(os.path.join(action_dir, "edge", frame))
        pre_rgba = overlap_edge_on_img(edge, pre_rgba)
        pre_rgba = cat_with_rotated(pre_rgba)
        mask = cat_mask_with_rotated(mask)
        post = cat_with_rotated(post)
        if pos is not None:
            pos = cat_with_rotated(pos)
    if pos is not None:
        pos = pos[..., :3]

    post_rgb = post[..., :3] * post[..., 3:4] + (1.0 - post[..., 3:4])

    feats = [normalize(pre_rgba[..., :3])]
    if use_mask:
        feats.append(mask[..., None])
    if use_pos:
        feats.append(normalize(pos[..., 0:2]))
    pre = np.concatenate(feats, axis=-1)

    # valid midpoints: mask dilated by MaxFilter(7) → radius 3
    from scipy import ndimage
    valid = ndimage.maximum_filter(mask, size=7) > 0
    ys, xs = np.nonzero(valid)
    valid_yx = np.stack([ys, xs], axis=1).astype(np.int32)

    # bucket-pad the midpoint list: its length N differs for EVERY uid, and
    # a static N retraces + re-loads the GAN train program per uid of a
    # sweep (~30-60 s compile + remote program load each). Padding to the
    # next 16384 bucket with wrapped entries (never sampled — the sampler
    # bounds indices by the real n_valid) makes the program shape shared.
    n_real = len(valid_yx)
    bucket = max(16384, -(-n_real // 16384) * 16384)
    pad = np.resize(valid_yx, (bucket, 2)) if n_real else np.zeros(
        (bucket, 2), np.int32)

    return KeyframeData(
        pre=jnp.asarray(pre, jnp.float32),
        post=jnp.asarray(normalize(post_rgb), jnp.float32),
        mask=jnp.asarray(mask, jnp.float32),
        valid_yx=jnp.asarray(pad),
        n_valid=jnp.asarray(max(n_real, 1), jnp.int32),
    )


def _cut(img: jnp.ndarray, yx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Zero-padded ``size``² patch centered at yx from (H, W, C)."""
    hs = size // 2
    padded = jnp.pad(img, ((hs, hs), (hs, hs), (0, 0)))
    return jax.lax.dynamic_slice(
        padded, (yx[0], yx[1], 0), (size, size, img.shape[-1]))


@partial(jax.jit, static_argnames=("batch", "size"))
def sample_patches(data: KeyframeData, key: jax.Array, batch: int,
                   size: int) -> Dict[str, jnp.ndarray]:
    """Random patch batch: pre/post/mask at shared midpoints + an
    independent random GT patch (+mask) for the discriminator."""
    k1, k2 = jax.random.split(key)
    # traced bound when the midpoint list is bucket-padded (shared program
    # across uids); static shape bound otherwise
    n = data.n_valid if data.n_valid is not None else data.valid_yx.shape[0]
    i1 = jax.random.randint(k1, (batch,), 0, n)
    i2 = jax.random.randint(k2, (batch,), 0, n)
    mids = data.valid_yx[i1]
    mids_r = data.valid_yx[i2]

    mask3 = data.mask[..., None]
    cut = lambda img: jax.vmap(lambda yx: _cut(img, yx, size))
    return {
        "pre": cut(data.pre)(mids),
        "post": cut(data.post)(mids),
        "pre_mask": cut(mask3)(mids),
        "already": cut(data.post)(mids_r),
        "already_mask": cut(mask3)(mids_r),
    }


def list_frames(action_dir: str, pass_name: str = "color"):
    d = os.path.join(action_dir, pass_name)
    return sorted(f for f in os.listdir(d) if f.endswith(".png"))


def load_full_frame_u8(action_dir: str, fname: str, use_edge: bool,
                       pre_dir: str = "color",
                       use_pos: bool = True) -> np.ndarray:
    """u8 source stack (H, W, 7): rgba(4) | edge(1) | pos_xy(2).

    Device-side assembly (train/gan.py::_full_frame_runner_u8) reproduces
    ``load_full_frame``'s feature math EXACTLY from these (u8/255 → the
    same f32 grid values), while the tunnel H2D moves 7 bytes/px instead
    of 24 (f32×6ch) — the transfer dominated full-frame eval latency
    (~330 ms of the 855 ms/frame, PERF_NOTES r3)."""
    from drawingspinup_tpu.core.io import read_image_u8
    rgba = read_image_u8(os.path.join(action_dir, pre_dir, fname))
    h, w = rgba.shape[:2]
    if rgba.shape[-1] == 3:
        rgba = np.concatenate(
            [rgba, np.full((h, w, 1), 255, np.uint8)], -1)
    if use_edge:
        edge = read_image_u8(
            os.path.join(action_dir, "edge", fname))[..., :1]
    else:
        edge = np.full((h, w, 1), 255, np.uint8)   # 255 = "no edge here"
    pos_path = os.path.join(action_dir, "pos", fname)
    if os.path.exists(pos_path):
        pos = read_image_u8(pos_path)[..., 0:2]
    elif use_pos:
        # mirror load_full_frame's f32 behavior: a missing render pass must
        # be an error, not silently-zero features (ADVICE r3)
        raise FileNotFoundError(
            f"pos pass missing for u8 full-frame features: {pos_path}")
    else:
        pos = np.zeros((h, w, 2), np.uint8)   # unused by the consumer
    return np.concatenate([rgba, edge, pos], axis=-1)


def load_full_frame(action_dir: str, fname: str, use_mask: bool,
                    use_pos: bool, use_edge: bool,
                    pre_dir: str = "color") -> Tuple[np.ndarray, np.ndarray]:
    """Inference-time full-frame features (reference DatasetFullImages)."""
    rgba = read_image(os.path.join(action_dir, pre_dir, fname))
    if rgba.shape[-1] == 3:
        rgba = np.concatenate([rgba, np.ones_like(rgba[..., :1])], -1)
    mask = rgba[..., 3]
    if use_edge:
        edge = read_image(os.path.join(action_dir, "edge", fname))
        rgba = overlap_edge_on_img(edge, rgba)
    feats = [normalize(rgba[..., :3])]
    if use_mask:
        feats.append(mask[..., None])
    if use_pos:
        pos = read_image(os.path.join(action_dir, "pos", fname))[..., :3]
        feats.append(normalize(pos[..., 0:2]))
    return np.concatenate(feats, axis=-1).astype(np.float32), mask
