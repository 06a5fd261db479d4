"""Checkpoint save/restore via Orbax (replaces the reference's three ad-hoc
mechanisms — flat state_dict ckpt, PyTorch-Lightning ckpts, and
``model_%05d.pth`` — SURVEY §5 'Checkpoint / resume')."""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def save(path: str, tree: Any, force: bool = True) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)


def latest_step(root: str, prefix: str = "step_") -> Optional[int]:
    """Find the highest ``<root>/<prefix>N`` checkpoint step on disk."""
    if not os.path.isdir(root):
        return None
    best = None
    pat = re.compile(re.escape(prefix) + r"(\d+)$")
    for name in os.listdir(root):
        m = pat.match(name)
        if m:
            s = int(m.group(1))
            best = s if best is None else max(best, s)
    return best


def step_path(root: str, step: int, prefix: str = "step_") -> str:
    return os.path.join(root, f"{prefix}{step}")
