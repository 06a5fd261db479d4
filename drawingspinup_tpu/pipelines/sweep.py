"""Batch sweep — the production 120-character pipeline.

The reference has no batch driver beyond shell loops; its only 'distributed'
machinery is dormant (SURVEY.md §2.5). Here the full-dataset sweep is a
first-class pipeline: per-uid stage chains with continue-on-error (the
failure-isolation behavior of the reference's Blender farm), a JSONL run
log, resume (uids with up-to-date outputs are skipped), and sharding of the
uid list across processes/hosts (``shard_index/num_shards`` — the DCN-level
axis; intra-chip parallelism lives inside each stage's jitted step).
"""
from __future__ import annotations

import json
import os
import time
import traceback
from typing import Callable, Dict, List, Optional, Sequence

from drawingspinup_tpu.core import UidPaths, load_uid_list
from drawingspinup_tpu.core.metrics import MetricsLogger

STAGES = ("stage1", "mv", "recon", "render", "train_style", "test_style",
          "gif")


def stage_done(paths: UidPaths, stage: str) -> bool:
    if stage == "stage1":
        return os.path.exists(paths.inpainted)
    if stage == "mv":
        return os.path.exists(paths.mv("color", "front"))
    if stage == "recon":
        return os.path.isdir(paths.mesh_dir) and any(
            f.endswith(".obj") for f in os.listdir(paths.mesh_dir))
    if stage == "render":
        return os.path.isdir(os.path.join(paths.render_dir, "rest_pose"))
    if stage == "train_style":
        # both per-character GANs finished: their final checkpoints exist
        # (gan.save_checkpoint FINAL_STEP → <mesh>/logs_stage{k}_*/model_99999)
        if not os.path.isdir(paths.mesh_dir):
            return False
        done = set()
        for d in os.listdir(paths.mesh_dir):
            for k in (1, 2):
                if d.startswith(f"logs_stage{k}") and os.path.exists(
                        os.path.join(paths.mesh_dir, d, "model_99999")):
                    done.add(k)
        return done == {1, 2}
    if stage == "test_style":
        # every action dir carries a non-empty res_stage* output dir
        if not os.path.isdir(paths.render_dir):
            return False
        actions = [d for d in os.listdir(paths.render_dir)
                   if os.path.isdir(os.path.join(paths.render_dir, d))]
        if not actions:
            return False
        for a in actions:
            adir = os.path.join(paths.render_dir, a)
            res = [d for d in os.listdir(adir) if d.startswith("res_stage")
                   and os.listdir(os.path.join(adir, d))]
            if not res:
                return False
        return True
    if stage == "gif":
        return os.path.isdir(paths.gif_dir) and bool(os.listdir(paths.gif_dir))
    return False


def _transient(e: Exception) -> bool:
    """Device-loss errors worth one retry (remote worker crash/restart).

    Matched by exception TYPE first (jaxlib runtime errors), then by status
    substring — an application ValueError whose text merely mentions
    'UNAVAILABLE' is not retried (ADVICE r1)."""
    try:
        from jax.errors import JaxRuntimeError
        runtime_types: tuple = (JaxRuntimeError,)
    except ImportError:  # older jaxlib spells it XlaRuntimeError
        try:
            from jaxlib.xla_extension import XlaRuntimeError
            runtime_types = (XlaRuntimeError,)
        except ImportError:
            runtime_types = ()
    if runtime_types and not isinstance(e, runtime_types):
        return False
    msg = str(e)
    return any(s in msg for s in
               ("UNAVAILABLE", "crashed or restarted", "DEADLINE_EXCEEDED"))


def run_sweep(root: str, uid_json: str,
              stage_fns: Dict[str, Callable[[str], None]],
              shard_index: int = 0, num_shards: int = 1,
              resume: bool = True,
              log_path: Optional[str] = None,
              stage_major: bool = True) -> Dict[str, List[str]]:
    """Run the given per-uid stage functions over a uid shard.

    stage_fns: {stage_name: fn(uid)} executed in declaration order. A stage
    failure logs the traceback and skips that uid's remaining stages
    (other uids continue) — no partial output is deleted.

    stage_major=True (default) runs ALL uids through each stage before the
    next stage — the reference's own CLI structure, and on this backend
    also the fast order: the remote service reloads each large executable
    when another stage's programs displace it (~1-3 min/program,
    PERF_NOTES.md), so uid-major interleaving pays that reload for every
    uid while stage-major pays it once per stage.
    """
    uids = load_uid_list(uid_json)
    uids = uids[shard_index::num_shards]
    logger = MetricsLogger(log_path or os.path.join(root, "sweep_log.jsonl"))
    skip: Dict[str, str] = {}          # uid -> failed stage
    t_uid = {uid: 0.0 for uid in uids}

    def run_one(uid: str, stage: str, fn) -> None:
        paths = UidPaths(root, uid)
        if resume and stage_done(paths, stage):
            return
        st = time.time()
        try:
            try:
                fn(uid)
            except Exception as e:  # retry once on transient device loss
                # (the remote TPU worker is observed to crash/restart under
                # heavy D2H; recon resumes from its checkpoint)
                if not _transient(e):
                    raise
                logger.log(uid=uid, stage=stage, retry=True,
                           error=str(e)[:500])
                print(f"[sweep] {uid}/{stage} transient device error — "
                      f"retrying once: {e}")
                time.sleep(10.0)
                # the stage may have completed before the device dropped —
                # re-check instead of re-running (ADVICE r1)
                if not (resume and stage_done(paths, stage)):
                    fn(uid)
            # surface degraded-weights modes (heuristic ISNet matte, random
            # VGG, ...) in the run log — core/weights_policy.py
            from drawingspinup_tpu.core import weights_policy
            degraded = sorted({d["component"]
                               for d in weights_policy.degradations()})
            extra = {"degraded_weights": degraded} if degraded else {}
            logger.log(uid=uid, stage=stage, seconds=time.time() - st,
                       **extra)
            t_uid[uid] += time.time() - st
        except Exception as e:
            skip[uid] = stage
            logger.log(uid=uid, stage="FAILED", error=str(e),
                       traceback=traceback.format_exc()[-2000:])
            print(f"[sweep] {uid} FAILED at {stage}: {e}")

    if stage_major:
        for stage, fn in stage_fns.items():
            for uid in uids:
                if uid not in skip:
                    run_one(uid, stage, fn)
            print(f"[sweep {shard_index}/{num_shards}] stage {stage} done "
                  f"({len(skip)} failed)")
    else:
        for i, uid in enumerate(uids):
            for stage, fn in stage_fns.items():
                if uid in skip:
                    break
                run_one(uid, stage, fn)
            print(f"[sweep {shard_index}/{num_shards}] {i + 1}/{len(uids)} "
                  f"done ({len(skip)} failed)")

    ok = [u for u in uids if u not in skip]
    for uid in ok:
        logger.log(uid=uid, stage="done", seconds=t_uid[uid])
    return {"ok": ok, "failed": [u for u in uids if u in skip]}
