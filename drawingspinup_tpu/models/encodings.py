"""Auxiliary encodings + model utilities (reference network_utils.py /
models/utils.py parity items not covered elsewhere)."""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def vanilla_frequency(x: jnp.ndarray, n_frequencies: int,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Positional encoding [sin(2^k x), cos(2^k x)]_k with optional per-band
    annealing mask (reference VanillaFrequency, network_utils.py:14-37).
    x (..., C) → (..., C·2·n_frequencies)."""
    bands = 2.0 ** jnp.arange(n_frequencies)
    out = []
    for k in range(n_frequencies):
        m = 1.0 if mask is None else mask[k]
        out.append(jnp.sin(bands[k] * x) * m)
        out.append(jnp.cos(bands[k] * x) * m)
    return jnp.concatenate(out, axis=-1)


def frequency_mask(n_frequencies: int, step: jnp.ndarray,
                   n_masking_step: int) -> jnp.ndarray:
    """Cosine-annealed band mask (network_utils.py:30-36)."""
    if n_masking_step <= 0:
        return jnp.ones((n_frequencies,))
    t = step.astype(jnp.float32) / n_masking_step * n_frequencies \
        - jnp.arange(n_frequencies)
    return (1.0 - jnp.cos(np.pi * jnp.clip(t, 0.0, 1.0))) / 2.0


def spherical_harmonics_l4(dirs: jnp.ndarray) -> jnp.ndarray:
    """Degree-4 real SH basis of unit directions (..., 3) → (..., 16).
    The reference configures SH dir encoding (neuralangelo yaml texture
    block) though its fork bypasses it; provided for full capability."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    return jnp.stack([
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.31539156525252005 * (3 * zz - 1),
        -1.0925484305920792 * x * z,
        0.5462742152960396 * (xx - yy),
        -0.5900435899266435 * y * (3 * xx - yy),
        2.890611442640554 * x * y * z,
        -0.4570457994644658 * y * (5 * zz - 1),
        0.3731763325901154 * z * (5 * zz - 3),
        -0.4570457994644658 * x * (5 * zz - 1),
        1.445305721320277 * z * (xx - yy),
        -0.5900435899266435 * x * (xx - 3 * yy),
    ], axis=-1)


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with a clamped backward (reference models/utils.py:52-67)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    # reference models/utils.py:65 clamps only the MAX (torch.clamp(x, max=15))
    return (g * jnp.exp(jnp.minimum(x, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def chunk_batch(fn: Callable, chunk_size: int, *args: jnp.ndarray):
    """Apply fn over row chunks of the leading axis and concatenate
    (reference models/utils.py:12-49). Host-side loop; each chunk is padded
    to chunk_size so only ONE compiled program is used."""
    n = args[0].shape[0]
    outs = []
    for i in range(0, n, chunk_size):
        seg = [a[i:i + chunk_size] for a in args]
        pad = chunk_size - seg[0].shape[0]
        if pad:
            seg = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
                   for a in seg]
        out = fn(*seg)
        outs.append(jax.tree.map(lambda o: o[: chunk_size - pad]
                                 if pad else o, out))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
