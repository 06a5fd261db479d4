"""Process-level JAX configuration for the framework's entry points.

* persistent compilation cache — the NSR train step takes minutes to compile
  on the TPU backend; with the cache, the second and later runs (e.g. each
  uid of the 120-character sweep, or re-runs) start instantly.
* helpers to force the CPU backend with N virtual devices (the axon TPU
  plugin overrides JAX_PLATFORMS from the environment; only jax.config
  wins — discovered the hard way).
"""
from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "DSU_JAX_CACHE", os.path.expanduser("~/.cache/drawingspinup_tpu/jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # cache is an optimization, never a requirement


def force_cpu(n_devices: int = 8) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
