"""Multi-view / cross-domain attention blocks for the MV-diffusion UNet.

The novel math of the reference's Wonder3D fork
(``mvdiffusion/models/transformer_mv2d.py``):
  * MV attention (:646-786): self-attention where each view's queries attend
    over the K/V of ALL ``num_views`` views concatenated along sequence;
    sparse variant (:787-791) attends only to the front view ⊕ itself.
  * Joint (cross-domain) attention (:940-985): the batch holds two domain
    halves (normals, colors); K/V of both halves are concatenated so each
    domain attends to both. Output projection zero-initialized (:505, :524).
  * BasicMVTransformerBlock (:377-625): LayerNorm → MV self-attn →
    [joint-mid] → cross-attn (CLIP tokens) → GEGLU FF → [joint-last].

TPU design: all variants lower to ``jax.nn.dot_product_attention`` over
reshaped (batch, seq, heads, dim) tensors — XLA fuses the softmax; the view
axis folds into the KV sequence (a few thousand tokens — comfortably
on-chip, no ring machinery needed; SURVEY.md §5 'long-context').
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               heads: int) -> jnp.ndarray:
    """(B, Sq, C) × (B, Sk, C) → (B, Sq, C) multi-head attention.

    The core runs in f32 regardless of the surrounding compute dtype:
    measured on v5e, ``jax.nn.dot_product_attention`` in bf16 falls onto a
    path 5× SLOWER than f32 (183 vs 35 ms at the MV shapes) while convs
    speed up 3× in bf16 — so mixed-precision sampling upcasts only here."""
    dt = q.dtype
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    q = q.reshape(b, sq, heads, d).astype(jnp.float32)
    k = k.reshape(b, sk, heads, d).astype(jnp.float32)
    v = v.reshape(b, sk, heads, d).astype(jnp.float32)
    out = jax.nn.dot_product_attention(q, k, v)
    return out.reshape(b, sq, c).astype(dt)


class Attention(nn.Module):
    """q/k/v/out projection attention (diffusers ``Attention`` layout:
    to_q, to_k, to_v bias-free; to_out with bias)."""

    heads: int
    cross_dim: Optional[int] = None
    zero_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 kv_fold: Optional[str] = None, num_views: int = 1
                 ) -> jnp.ndarray:
        """kv_fold: None | 'views' | 'views_sparse' | 'domains'."""
        c = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(c, use_bias=False, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(c, use_bias=False, name="to_v")(ctx)

        if kv_fold == "views":
            # (B·V, S, C) → each view attends over all views' tokens.
            # Queries fold along sequence too: per-row attention is
            # independent, so self-attention over the (b, V·S) folded
            # sequence is EXACTLY the repeated-KV computation without
            # materializing V copies of K/V (at 32² latents the repeat
            # alone wrote ~190 MB/instance to HBM) — and the single
            # (b, V·S)² attention tiles the MXU better than V small ones.
            bv, s, _ = q.shape
            b = bv // num_views
            q = q.reshape(b, num_views * s, c)
            k = k.reshape(b, num_views * s, c)
            v = v.reshape(b, num_views * s, c)
            out = _attention(q, k, v, self.heads).reshape(bv, s, c)
            init = nn.initializers.zeros if self.zero_out \
                else nn.initializers.lecun_normal()
            return nn.Dense(c, kernel_init=init, name="to_out")(out)
        elif kv_fold == "domains":
            # batch = [domain0 | domain1]; K/V see both domains. Same
            # query-folding identity: stack the two domain halves along
            # sequence and run plain self-attention over (h, 2S).
            bv, s, _ = q.shape
            h2 = bv // 2
            q = jnp.concatenate([q[:h2], q[h2:]], axis=1)   # (h, 2s, c)
            k = jnp.concatenate([k[:h2], k[h2:]], axis=1)
            v = jnp.concatenate([v[:h2], v[h2:]], axis=1)
            out = _attention(q, k, v, self.heads)
            out = jnp.concatenate([out[:, :s], out[:, s:]], axis=0)
            init = nn.initializers.zeros if self.zero_out \
                else nn.initializers.lecun_normal()
            return nn.Dense(c, kernel_init=init, name="to_out")(out)
        elif kv_fold == "views_sparse":
            bv, s, _ = k.shape
            b = bv // num_views
            k_front = jnp.repeat(k.reshape(b, num_views, s, c)[:, 0],
                                 num_views, axis=0)
            v_front = jnp.repeat(v.reshape(b, num_views, s, c)[:, 0],
                                 num_views, axis=0)
            k = jnp.concatenate([k_front, k], axis=1)
            v = jnp.concatenate([v_front, v], axis=1)

        out = _attention(q, k, v, self.heads)
        init = nn.initializers.zeros if self.zero_out \
            else nn.initializers.lecun_normal()
        return nn.Dense(c, kernel_init=init, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='geglu'): Dense→(x·gelu(gate))→Dense."""

    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.Dense(c * self.mult * 2, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu is the exact (erf) form — approximate=True drifts ~1e-3
        # and fails the executed UNet forward oracle
        h = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(c, name="proj_out")(h)


class BasicMVTransformerBlock(nn.Module):
    heads: int
    cross_dim: int = 768
    num_views: int = 6
    multiview_attention: bool = True
    sparse_mv_attention: bool = False
    cd_attention_mid: bool = False
    cd_attention_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        fold = None
        if self.multiview_attention:
            fold = "views_sparse" if self.sparse_mv_attention else "views"
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.heads, name="attn1")(
            h, kv_fold=fold, num_views=self.num_views)
        if self.cd_attention_mid:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_joint_mid")(x)
            x = x + Attention(self.heads, zero_out=True,
                              name="attn_joint_mid")(h, kv_fold="domains")
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Attention(self.heads, cross_dim=self.cross_dim,
                          name="attn2")(h, context=context)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        x = x + GEGLUFeedForward(name="ff")(h)
        if self.cd_attention_last:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_joint_last")(x)
            x = x + Attention(self.heads, zero_out=True,
                              name="attn_joint_last")(h, kv_fold="domains")
        return x


class TransformerMV2D(nn.Module):
    """Spatial transformer: GN → 1×1 proj_in → token blocks → proj_out + res
    (reference TransformerMV2DModel :64-374, use_linear_projection=False
    conv path folded to dense since kernel is 1×1)."""

    heads: int
    depth: int = 1
    cross_dim: int = 768
    num_views: int = 6
    sparse_mv_attention: bool = False
    cd_attention_mid: bool = False
    cd_attention_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        y = nn.Dense(c, name="proj_in")(y.reshape(n, h * w, c))
        for i in range(self.depth):
            y = BasicMVTransformerBlock(
                heads=self.heads, cross_dim=self.cross_dim,
                num_views=self.num_views,
                sparse_mv_attention=self.sparse_mv_attention,
                cd_attention_mid=self.cd_attention_mid,
                cd_attention_last=self.cd_attention_last,
                name=f"block{i}")(y, context)
        y = nn.Dense(c, name="proj_out")(y).reshape(n, h, w, c)
        return y + res
