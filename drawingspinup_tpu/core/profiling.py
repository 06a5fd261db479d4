"""First-class timing + profiling (the reference only has ad-hoc
``time.time()`` prints — SURVEY §5). Provides scoped wall-clock timers with a
global report, and an optional ``jax.profiler`` trace context.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

_TIMINGS: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def timer(name: str, sync: bool = False) -> Iterator[None]:
    """Time a block; ``sync=True`` blocks on outstanding device work first so
    the measurement covers actual device execution."""
    if sync:
        jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            jax.effects_barrier()
        _TIMINGS[name].append(time.perf_counter() - t0)


def block_until_ready(tree) -> None:
    jax.block_until_ready(tree)


def timings() -> Dict[str, Dict[str, float]]:
    out = {}
    for k, vals in _TIMINGS.items():
        out[k] = {
            "count": len(vals),
            "total_s": sum(vals),
            "mean_s": sum(vals) / len(vals),
            "last_s": vals[-1],
        }
    return out


def reset_timings() -> None:
    _TIMINGS.clear()


def report(prefix: str = "") -> str:
    lines = []
    for k, st in sorted(timings().items()):
        if prefix and not k.startswith(prefix):
            continue
        lines.append(f"{k:40s} n={st['count']:5d} total={st['total_s']:9.3f}s "
                     f"mean={st['mean_s'] * 1e3:9.2f}ms")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
