"""Fused Pallas RICConv — rotation-invariant 3×3 conv in one VMEM-resident
kernel.

The XLA formulation (models/generator_j.py::RICConv variant="fused")
necessarily materializes two (N,H,W,9,O) intermediates per conv in HBM
(the per-tap channel matmul ``z`` and the tap→shift contraction ``y``);
XLA cost analysis attributes ~14 GB/step of the stage-3 GAN trainer's
16.7 GB to the generator's 20 RIC convs. This kernel keeps the whole
chain — 9 tap matmuls (MXU), the per-pixel tap→shift contraction (VPU),
and the 9 static shift-accumulates — in VMEM, so HBM traffic drops to
x + wk + swf + out.

Layout: everything is flattened to (rows = B_t·H·W, channels) 2D vectors
so channels sit in lanes and rows in sublanes. A 2D shift by (sy, sx)
becomes a roll of the rows axis by -(sy·W + sx) plus a per-row validity
mask (precomputed host-side); wrap-around rows — including rows that
would cross an image boundary when B_t > 1 — are provably zeroed by the
same mask (a row wraps iff its 2D source is out of range). The earlier
4D formulation padded O and W to 128 lanes (swf alone: 4.7 MB) and
overflowed the 16 MB VMEM scoped allocation; this form keeps the whole
forward under ~8 MB at the production patch shapes.

Math is identical to the "fused" variant (same ``ric_shifted_weights``
tensor, same ``shift2d`` zero-fill semantics, f32 matmul accumulation);
summation order differs, so parity is ~1e-5, asserted by
tests/test_ric_pallas.py in interpret mode. Replaces the reference's
``torchvision.ops.deform_conv2d`` hot loop
(3_style_translator/training/models.py:293-356).

Custom VJP: the backward fused the same way — unshifted cotangents are
contracted with swf per tap (VPU), then one dx matmul and one dwk matmul
per tap; dwk accumulates across the batch grid in a constant-index output
block (sequential TPU grid).
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHIFTS = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]

# Static (shift i, tap t) sparsity of ric_shifted_weights: the CENTER tap
# (t=4) never moves under rotation, so it contributes only to the center
# shift (i=4) — 8 of the 81 planes are identically zero for every (H, W).
# (Verified numerically for hw ∈ {8,16,32}; the interpret-mode parity
# tests vs the XLA formulation would catch any violation.)
# Parity caveat: skipping the zero planes also skips their NaN·0 products,
# so parity with the XLA "fused" variant holds only up to NaN·0 absorption
# on the skipped planes — a non-finite input channel reaching ONLY the
# center tap could yield finite output here where fused yields NaN. For
# finite inputs (the training contract) the two are identical.
def _active(i: int, t: int) -> bool:
    return t != 4 or i == 4

# rows per grid step (B_t·H·W). Per-layer dependent-chain attribution
# (scripts/bench_ric_layers.py) shows per-grid-step overhead — not VPU
# math — dominates at the production 32² patch shapes: upconv1 fwd+bwd is
# 1.18 ms/conv at rows=1024, 0.72 at 2048, 0.56 at 4096 (grid 40→10), and
# the full GAN train step drops 11.56 → 7.17 ms. rows=8192 OOMs Mosaic's
# scoped VMEM in the conv_11 backward (114.6 MB > 100 MB cap, v5e).
# Overridable for on-chip block-size sweeps.
_TARGET_ROWS = int(os.environ.get("DSU_RIC_TARGET_ROWS", "4096"))

# Mosaic's default 16 MB scoped-vmem cap is far below the v5e's physical
# VMEM; the unrolled (rows, O) tap-broadcast temporaries are all hoisted
# by the compiler, so the kernel stack grows with rows (fwd ~41 MB at
# rows=1024 pre-plane-skip). Accumulating the contraction into ONE explicit
# VMEM scratch (in-place stores) was tried to cut the hoisted temps and is
# a measured NEGATIVE: the serialized stores cost ~1 ms/step of ILP
# (8.21 vs 7.17 ms GAN step at rows=4096) — don't re-try (PERF_NOTES r4).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _valid_masks(h: int, w: int) -> np.ndarray:
    """(H·W, 9) f32: valid[p, i] = 1 where output pixel p's shifted source
    (a+sy_i, b+sx_i) is inside the image — the shift2d zero-fill mask."""
    rows, cols = np.mgrid[0:h, 0:w]
    out = np.zeros((h * w, 9), np.float32)
    for i, (sy, sx) in enumerate(SHIFTS):
        ok = ((rows + sy >= 0) & (rows + sy < h)
              & (cols + sx >= 0) & (cols + sx < w))
        out[:, i] = ok.reshape(-1).astype(np.float32)
    return out


def _col(ref_slice: jnp.ndarray, bt: int, hw: int) -> jnp.ndarray:
    """(hw, 1) column → (bt·hw, 1) by repetition along rows."""
    if bt == 1:
        return ref_slice
    return jnp.broadcast_to(ref_slice[None], (bt, hw, 1)).reshape(bt * hw, 1)


def _fwd_kernel(w: int, bt: int, x_ref, wk_ref, swf_ref, valid_ref, out_ref):
    _, hw, c = x_ref.shape
    o = out_ref.shape[-1]
    rows = bt * hw
    x_mat = x_ref[:].reshape(rows, c)
    zs = [
        jnp.dot(x_mat, wk_ref[t], preferred_element_type=jnp.float32)
        for t in range(9)
    ]
    acc = jnp.zeros((rows, o), jnp.float32)
    for i, (sy, sx) in enumerate(SHIFTS):
        y_i = None
        for t in range(9):
            if not _active(i, t):
                continue
            term = zs[t] * _col(swf_ref[:, (i * 9 + t):(i * 9 + t) + 1],
                                bt, hw)
            y_i = term if y_i is None else y_i + term
        off = sy * w + sx
        # out[p] = valid_i[p] ? y_i[p + off] : 0 — where, not multiply:
        # a non-finite wrap value times 0 would be NaN, while shift2d's
        # pad+slice guarantees hard zeros regardless of input (ADVICE r2)
        shifted = jnp.roll(y_i, -off, axis=0) if off else y_i
        acc = acc + jnp.where(
            _col(valid_ref[:, i:i + 1], bt, hw) != 0, shifted, 0.0)
    out_ref[:] = acc.reshape(bt, hw, o)


def _bwd_kernel(w: int, bt: int, x_ref, wk_ref, swf_ref, valid_ref, g_ref,
                dx_ref, dwk_ref):
    _, hw, c = x_ref.shape
    o = g_ref.shape[-1]
    rows = bt * hw
    g = g_ref[:].reshape(rows, o)
    # d y_i = roll(valid_i-select g, +off_i): the forward's valid mask
    # already zeroes every row whose roll would wrap (incl. across images
    # in the B_t-tiled rows axis), so no post-roll mask is needed. where,
    # not multiply — hard zeros even under non-finite cotangents (ADVICE r2).
    daccs = []
    for i, (sy, sx) in enumerate(SHIFTS):
        off = sy * w + sx
        gi = jnp.where(_col(valid_ref[:, i:i + 1], bt, hw) != 0, g, 0.0)
        daccs.append(jnp.roll(gi, off, axis=0) if off else gi)
    x_mat = x_ref[:].reshape(rows, c)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)

    dx = None
    for t in range(9):
        dz = None
        for i in range(9):
            if not _active(i, t):
                continue
            term = daccs[i] * _col(swf_ref[:, (i * 9 + t):(i * 9 + t) + 1],
                                   bt, hw)
            dz = term if dz is None else dz + term
        # dx += dz · Wkᵀ  (contract O)
        term = jax.lax.dot_general(
            dz, wk_ref[t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = term if dx is None else dx + term
        # dWk[t] += xᵀ · dz  (contract rows)
        dwk_ref[t] += jax.lax.dot_general(
            x_mat, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bt, hw, c)


def _pick_bt(n: int, hw: int) -> int:
    target = max(1, _TARGET_ROWS // hw)
    for bt in range(min(target, n), 0, -1):
        if n % bt == 0:
            return bt
    return 1


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _flatten_inputs(x, swf):
    """(N,H,W,C) → (N,HW,C); swf (9,9,H,W) → (HW, 81) with column i·9+t;
    plus the (HW, 9) validity masks (host constants)."""
    n, h, w, c = x.shape
    x2 = x.reshape(n, h * w, c)
    swf2 = jnp.transpose(swf, (2, 3, 0, 1)).reshape(h * w, 81)
    valid = jnp.asarray(_valid_masks(h, w))
    return x2, swf2, valid


def _fwd_call(x, wk, swf):
    n, h, w, c = x.shape
    o = wk.shape[-1]
    hw = h * w
    bt = _pick_bt(n, hw)
    x2, swf2, valid = _flatten_inputs(x, swf)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w, bt),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, 81), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, hw, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, o), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x2, wk, swf2, valid)
    return out.reshape(n, h, w, o)


def _bwd_call(x, wk, swf, g):
    n, h, w, c = x.shape
    o = wk.shape[-1]
    hw = h * w
    bt = _pick_bt(n, hw)
    x2, swf2, valid = _flatten_inputs(x, swf)
    dx, dwk = pl.pallas_call(
        functools.partial(_bwd_kernel, w, bt),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, 81), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hw, o), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index map: the (9,C,O) gradient block stays resident
            # and accumulates across the sequential batch grid
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), jnp.float32),
            jax.ShapeDtypeStruct((9, c, o), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x2, wk, swf2, valid, g.reshape(n, hw, o))
    return dx.reshape(n, h, w, c), dwk


@jax.custom_vjp
def ric_conv(x: jnp.ndarray, wk: jnp.ndarray, swf: jnp.ndarray
             ) -> jnp.ndarray:
    """x (N,H,W,C) f32, wk (9,C,O) f32, swf (9 shifts, 9 taps, H, W) f32
    (``ric_shifted_weights``) → (N,H,W,O) f32."""
    return _fwd_call(x, wk, swf)


def _vjp_fwd(x, wk, swf):
    return _fwd_call(x, wk, swf), (x, wk, swf)


def _vjp_bwd(res, g):
    x, wk, swf = res
    dx, dwk = _bwd_call(x, wk, swf, g)
    return dx, dwk, jnp.zeros_like(swf)


ric_conv.defvjp(_vjp_fwd, _vjp_bwd)
