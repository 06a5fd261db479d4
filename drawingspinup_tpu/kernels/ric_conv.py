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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHIFTS = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]

# rows per grid step (B_t·H·W); 1024 keeps the 9 per-tap (rows, O≤128)
# f32 buffers at ≤4.7 MB so forward+backward stay well inside 16 MB VMEM
_TARGET_ROWS = 1024


def _shift_val(v: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """shift2d semantics on a (B,H,W,O) VALUE: out[a,b] = v[a+sy, b+sx],
    zero beyond the border (models/generator_j.py::shift2d).

    Written as static roll + iota border mask: Mosaic's TPU lowering has
    no pad/dynamic_slice, but roll decomposes to static slice+concat and
    broadcasted_iota lowers natively (all shifts here are compile-time
    constants in {-1,0,1})."""
    if sy == 0 and sx == 0:
        return v
    _, h, w, _ = v.shape
    out = v
    if sy:
        out = jnp.roll(out, -sy, axis=1)  # roll(v,-s)[a] = v[a+s]
    if sx:
        out = jnp.roll(out, -sx, axis=2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((rows + sy >= 0) & (rows + sy < h)
             & (cols + sx >= 0) & (cols + sx < w))
    return out * valid.astype(v.dtype)[None, :, :, None]


def _fwd_kernel(x_ref, wk_ref, swf_ref, out_ref):
    bt, h, w, c = x_ref.shape
    o = out_ref.shape[-1]
    x_mat = x_ref[:].reshape(bt * h * w, c)
    zs = [
        jnp.dot(x_mat, wk_ref[t], preferred_element_type=jnp.float32)
        .reshape(bt, h, w, o)
        for t in range(9)
    ]
    acc = jnp.zeros((bt, h, w, o), jnp.float32)
    for i, (sy, sx) in enumerate(SHIFTS):
        y_i = zs[0] * swf_ref[i, 0][None, :, :, None]
        for t in range(1, 9):
            y_i = y_i + zs[t] * swf_ref[i, t][None, :, :, None]
        acc = acc + _shift_val(y_i, sy, sx)
    out_ref[:] = acc


def _bwd_kernel(x_ref, wk_ref, swf_ref, g_ref, dx_ref, dwk_ref):
    bt, h, w, c = x_ref.shape
    o = g_ref.shape[-1]
    g = g_ref[:]
    # d y_i = unshift(g); d z_t = Σ_i swf[i,t] ⊙ d y_i
    daccs = [_shift_val(g, -sy, -sx) for (sy, sx) in SHIFTS]
    x_mat = x_ref[:].reshape(bt * h * w, c)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwk_ref[:] = jnp.zeros_like(dwk_ref)

    dx = None
    for t in range(9):
        dz = daccs[0] * swf_ref[0, t][None, :, :, None]
        for i in range(1, 9):
            dz = dz + daccs[i] * swf_ref[i, t][None, :, :, None]
        dz_m = dz.reshape(bt * h * w, o)
        # dx += dz · Wkᵀ  (contract O)
        term = jax.lax.dot_general(
            dz_m, wk_ref[t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = term if dx is None else dx + term
        # dWk[t] += xᵀ · dz  (contract rows)
        dwk_ref[t] += jax.lax.dot_general(
            x_mat, dz_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bt, h, w, c)


def _pick_bt(n: int, hw: int) -> int:
    target = max(1, _TARGET_ROWS // hw)
    for bt in range(min(target, n), 0, -1):
        if n % bt == 0:
            return bt
    return 1


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_call(x, wk, swf):
    n, h, w, c = x.shape
    o = wk.shape[-1]
    bt = _pick_bt(n, h * w)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 9, h, w), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), jnp.float32),
        interpret=_interpret(),
    )(x, wk, swf)


def _bwd_call(x, wk, swf, g):
    n, h, w, c = x.shape
    o = wk.shape[-1]
    bt = _pick_bt(n, h * w)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 9, h, w), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h, w, o), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index map: the (9,C,O) gradient block stays resident
            # and accumulates across the sequential batch grid
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
            jax.ShapeDtypeStruct((9, c, o), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, wk, swf, g)


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
