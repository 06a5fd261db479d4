"""Fused Pallas RICConv (kernels/ric_conv.py) vs the XLA "fused" variant —
forward and VJP parity in interpret mode (conftest pins CPU, so the kernel
runs through the Pallas interpreter; on-chip adoption is gated on the A/B
in scripts/bench_ric_pallas.py)."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drawingspinup_tpu.kernels.ric_conv import ric_conv
from drawingspinup_tpu.models.generator_j import (
    GeneratorJ_RIC, RICConv, ric_shifted_weights, shift2d,
)


def _xla_fused(x, wk, swf):
    """Reference math: the RICConv variant=\"fused\" forward as pure jnp."""
    shifts = [(sy, sx) for sy in (-1, 0, 1) for sx in (-1, 0, 1)]
    z = jnp.einsum("nhwc,tco->nhwto", x, wk,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("nhwto,ithw->nhwio", z, swf,
                   preferred_element_type=jnp.float32)
    out = None
    for i, (sy, sx) in enumerate(shifts):
        t = shift2d(y[:, :, :, i, :], sy, sx)
        out = t if out is None else out + t
    return out


@pytest.mark.parametrize("shape", [
    (5, 8, 8, 12, 16),     # bt divides oddly (bt=5)
    (4, 16, 16, 6, 8),     # production-ish small channels
    (3, 8, 8, 16, 16),
])
def test_forward_parity(shape, rng):
    n, h, w, c, o = shape
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((9, c, o)) * 0.1, jnp.float32)
    swf = jnp.asarray(ric_shifted_weights(h, w))
    got = ric_conv(x, wk, swf)
    want = _xla_fused(x, wk, swf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_vjp_parity(rng):
    n, h, w, c, o = 4, 8, 8, 12, 16
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((9, c, o)) * 0.1, jnp.float32)
    swf = jnp.asarray(ric_shifted_weights(h, w))
    cot = jnp.asarray(rng.standard_normal((n, h, w, o)), jnp.float32)

    def loss_k(x, wk):
        return jnp.sum(ric_conv(x, wk, swf) * cot)

    def loss_r(x, wk):
        return jnp.sum(_xla_fused(x, wk, swf) * cot)

    gx_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r),
                               atol=3e-4, rtol=3e-4)


def test_generator_variant_parity(rng):
    """GeneratorJ_RIC(ric_variant=\"pallas\") ≡ \"fused\" end-to-end."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
    kw = dict(filters=(4, 6, 8, 8, 8, 6), resnet_blocks=1)
    gf = GeneratorJ_RIC(ric_variant="fused", **kw)
    gp = GeneratorJ_RIC(ric_variant="pallas", **kw)
    v = gf.init(jax.random.PRNGKey(0), x)
    yf = gf.apply(v, x)
    yp = gp.apply(v, x)   # same param structure
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                               atol=5e-5, rtol=5e-5)


def test_nonfinite_input_keeps_hard_border_zeros(rng):
    """shift2d (pad + slice) guarantees hard zeros at shifted-out borders
    regardless of input; the kernel's where-based select must match even
    when the activations carry NaN/Inf (ADVICE r2 — a multiply-based mask
    would produce 0·Inf = NaN at the border)."""
    n, h, w, c, o = 2, 8, 8, 6, 8
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    x[0, 0, 0, :] = np.nan
    x[1, -1, -1, :] = np.inf
    x = jnp.asarray(x)
    wk = jnp.asarray(rng.standard_normal((9, c, o)) * 0.1, jnp.float32)
    swf = jnp.asarray(ric_shifted_weights(h, w))
    got = np.asarray(ric_conv(x, wk, swf))
    want = np.asarray(_xla_fused(x, wk, swf))
    # non-finite propagates identically: wherever shift2d yields a finite
    # value (incl. its hard border zeros), the kernel must too
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hw", [8, 16, 32])
def test_zero_plane_skip_invariant(hw):
    """The kernel statically skips (shift i, tap t) planes where t == 4 and
    i != 4 (_active): the center tap never moves under rotation, so its
    weight lands only on the center shift. Pin that the 8 skipped planes of
    ric_shifted_weights are EXACTLY zero at every production layer size —
    if a future RIC sampling change violates this, the kernel silently
    drops real contributions."""
    from drawingspinup_tpu.kernels.ric_conv import _active

    swf = np.asarray(ric_shifted_weights(hw, hw))  # (9 shifts, 9 taps, H, W)
    for i in range(9):
        for t in range(9):
            if not _active(i, t):
                assert np.all(swf[i, t] == 0.0), (i, t)
    # and the kept planes are not trivially empty (sanity on the mask shape)
    assert np.abs(swf[4, 4]).max() > 0
