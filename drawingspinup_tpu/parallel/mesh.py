"""Device mesh + sharding helpers.

The reference's only "distributed" machinery is dormant DDP plumbing
(SURVEY.md §2.5). Here parallelism is first-class: a 2-axis ``(dp, tp)``
mesh — data parallel over uids/rays/patches, tensor parallel over feature
axes — with NamedSharding annotations; XLA inserts the collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: all devices on dp (pure data parallel) unless tp is given.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 1 if dp is None else max(1, n // dp)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel param sharding: shard the trailing (output-feature)
    axis over tp when it divides evenly; replicate everything else.

    Conv kernels are HWIO — sharding O splits the matmul's N dimension, the
    canonical Megatron-style column partition; XLA adds the all-gathers /
    reduce-scatters over ICI as needed.
    """
    tp = mesh.shape["tp"]

    def spec_for(x) -> NamedSharding:
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] % tp == 0 \
                and x.shape[-1] >= 2 * tp:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["tp"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
