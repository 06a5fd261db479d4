"""2-D real FFTs as DFT matmuls — the TPU-native spectral primitive.

The reference's FourierUnit leans on cuFFT (``torch.fft.rfftn/irfftn``,
ffc.py:85,107). On TPU, XLA's FFT op is not the right tool at FFC's working
resolutions (≤256²; the axon backend in this image does not implement it at
all): a dense DFT matmul runs on the MXU, fuses with the surrounding 1×1
frequency-domain conv, and at H=W=64..256 costs a negligible fraction of the
block's conv FLOPs. Matrices are cached per (size, dtype).

Conventions match ``numpy.fft.rfft2/irfft2(norm='ortho')`` over axes (1, 2)
of an NHWC tensor, returning (real, imag) channel pairs instead of complex
dtype (TPUs have no complex registers — keeping re/im separate lets XLA tile
everything onto the MXU).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _dft_w(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Forward rDFT matrices over the last (W) axis: (n, n//2+1) re/im."""
    k = np.arange(n)[:, None]
    f = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _dft_h(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full complex DFT matrices over the H axis: (n, n) re/im."""
    k = np.arange(n)[:, None]
    f = np.arange(n)[None, :]
    ang = -2.0 * np.pi * k * f / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _idft_w(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT synthesis matrices: (n//2+1, n) re/im with hermitian
    doubling weights (α=1 at DC and Nyquist, 2 elsewhere)."""
    nf = n // 2 + 1
    k = np.arange(nf)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    alpha = np.full((nf, 1), 2.0, np.float32)
    alpha[0] = 1.0
    if n % 2 == 0:
        alpha[-1] = 1.0
    return (alpha * np.cos(ang)).astype(np.float32), \
           (alpha * np.sin(ang)).astype(np.float32)


def rfft2_ortho(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC real → (re, im) each (N, H, W//2+1, C), norm='ortho'."""
    n, h, w, c = x.shape
    fw_re, fw_im = (jnp.asarray(m) for m in _dft_w(w))
    fh_re, fh_im = (jnp.asarray(m) for m in _dft_h(h))
    xf = x.astype(jnp.float32)
    # FFT over W (real input)
    a_re = jnp.einsum("nhwc,wf->nhfc", xf, fw_re,
                      preferred_element_type=jnp.float32)
    a_im = jnp.einsum("nhwc,wf->nhfc", xf, fw_im,
                      preferred_element_type=jnp.float32)
    # FFT over H (complex)
    y_re = jnp.einsum("nhfc,hg->ngfc", a_re, fh_re,
                      preferred_element_type=jnp.float32) \
        - jnp.einsum("nhfc,hg->ngfc", a_im, fh_im,
                     preferred_element_type=jnp.float32)
    y_im = jnp.einsum("nhfc,hg->ngfc", a_re, fh_im,
                      preferred_element_type=jnp.float32) \
        + jnp.einsum("nhfc,hg->ngfc", a_im, fh_re,
                     preferred_element_type=jnp.float32)
    scale = 1.0 / np.sqrt(h * w)
    return (y_re * scale).astype(x.dtype), (y_im * scale).astype(x.dtype)


def irfft2_ortho(y_re: jnp.ndarray, y_im: jnp.ndarray,
                 s: Tuple[int, int]) -> jnp.ndarray:
    """(re, im) (N, H, W//2+1, C) → NHWC real (N, s[0], s[1], C), norm='ortho'."""
    h, w = s
    fh_re, fh_im = (jnp.asarray(m) for m in _dft_h(h))
    gw_re, gw_im = (jnp.asarray(m) for m in _idft_w(w))
    yr = y_re.astype(jnp.float32)
    yi = y_im.astype(jnp.float32)
    # inverse over H: multiply by conj(F_h)/h (ortho: /sqrt(h) applied at end)
    z_re = jnp.einsum("ngfc,gh->nhfc", yr, fh_re,
                      preferred_element_type=jnp.float32) \
        + jnp.einsum("ngfc,gh->nhfc", yi, fh_im,
                     preferred_element_type=jnp.float32)
    z_im = jnp.einsum("ngfc,gh->nhfc", yi, fh_re,
                      preferred_element_type=jnp.float32) \
        - jnp.einsum("ngfc,gh->nhfc", yr, fh_im,
                     preferred_element_type=jnp.float32)
    # inverse real synthesis over W: x = Re(z) @ cos + (-Im... ) sign:
    # x[t] = Σ_k α_k (z_re cos(2πkt/w) - z_im sin(2πkt/w))
    out = jnp.einsum("nhfc,fw->nhwc", z_re, gw_re,
                     preferred_element_type=jnp.float32) \
        - jnp.einsum("nhfc,fw->nhwc", z_im, gw_im,
                     preferred_element_type=jnp.float32)
    # both inverse stages above are unnormalized (Σ without 1/h, 1/w); with
    # ortho-normalized input the net factor needed is 1/sqrt(h·w)
    out = out * (1.0 / np.sqrt(h * w))
    return out.astype(y_re.dtype)
