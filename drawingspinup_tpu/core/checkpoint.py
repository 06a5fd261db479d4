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


def save_async(path: str, tree: Any, force: bool = True):
    """Start an orbax save and return a ``wait()`` finalizer.

    StandardCheckpointer commits asynchronously; the blocking ``save()``
    above pays the full disk commit inline (~10 s of the recon stage's
    per-uid wall, PERF_NOTES r3). This form lets the caller overlap the
    commit with device work (recon_uid overlaps it with the export grid
    eval) and settle at ``wait()``."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=force)
    done = []

    def wait() -> None:          # idempotent: safe in finally + happy path
        if not done:
            done.append(True)
            try:
                ckptr.wait_until_finished()
            finally:
                ckptr.close()    # always release the background resources,
                                 # even when the commit itself fails (ADVICE r3)

    return wait


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
