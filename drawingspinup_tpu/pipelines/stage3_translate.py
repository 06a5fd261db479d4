"""Stage-3 orchestration: train/test the style translator per uid.

Reference flow (``3_style_translator/train_stage{1,2}.py``,
``test_stage{1,2}.py``, ``training/trainers.py``):
  stage 1: GeneratorJ_RIC on (color ⊕ mask ⊕ pos.xy), target =
           char/ffc_resnet_inpainted.png, 3 epochs, results → res_stage1_*;
  stage 2: GeneratorJ on stage-1 results WITH edge overlay, target =
           char/texture_with_bg.png, 2 epochs, results → res_stage2_*.
  An epoch = n_valid_pixels / batch_size batches; full-image eval +
  checkpoint every log_interval batches and at the end (model_99999).
"""
from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drawingspinup_tpu.core import UidPaths
from drawingspinup_tpu.core.io import read_image, write_image
from drawingspinup_tpu.pipelines import stage3_data
from drawingspinup_tpu.train import gan

FINAL_STEP = 99999


def stage_settings(stage: int, use_mask: bool = True, use_pos: bool = True):
    """Per-stage wiring (reference config_stage{1,2}.yaml + train CLIs)."""
    if stage == 1:
        return dict(generator="GeneratorJ_RIC", pre_dir="color",
                    post_name="ffc_resnet_inpainted", epochs=3,
                    use_edge=False, use_mask=use_mask, use_pos=use_pos)
    return dict(generator="GeneratorJ", pre_dir=None,  # filled from stage-1
                post_name="texture_with_bg", epochs=2,
                use_edge=True, use_mask=use_mask, use_pos=use_pos)


def log_name_for(stage: int, use_mask: bool, use_pos: bool) -> str:
    name = f"logs_stage{stage}"
    if use_mask:
        name += "_mask"
    if use_pos:
        name += "_pos"
    return name


def res_dir_name(stage: int, use_mask: bool, use_pos: bool) -> str:
    return log_name_for(stage, use_mask, use_pos).replace("logs", "res")


def _input_channels(use_mask: bool, use_pos: bool) -> int:
    return 3 + (1 if use_mask else 0) + (2 if use_pos else 0)


DEFAULT_STAGE_CFGS = {
    1: os.path.join(os.path.dirname(__file__), "..", "configs",
                    "config_stage1.yaml"),
    2: os.path.join(os.path.dirname(__file__), "..", "configs",
                    "config_stage2.yaml"),
}


def gan_config_from_yaml(path: str, use_mask: bool = True,
                         use_pos: bool = True, **overrides):
    """Load a reference-format stage-3 yaml (config_stage{1,2}.yaml:1-75 —
    generator/opt_generator/discriminator/perception_loss/trainer/job blocks)
    → (GANConfig, job dict with pre_dir/post_name/root_dir).

    The yaml's ``input_channels`` is the base RGB count; the mask/pos
    channels are added by the CLI flags exactly as the reference
    train_stage1.py:27-33 mutates them."""
    from drawingspinup_tpu.core import load_config

    y = load_config(path)
    job = y.get("job", y)
    g = job.get("generator", {})
    ga = g.get("args", {})
    og = job.get("opt_generator", {}).get("args", {})
    d = job.get("discriminator", {}).get("args", {})
    pl = job.get("perception_loss", {})
    tr = job.get("trainer", {})
    base_ch = int(ga.get("input_channels", 3))
    kw = dict(
        generator=g.get("type", "GeneratorJ_RIC"),
        filters=tuple(ga.get("filters", (32, 64, 128, 128, 128, 64))),
        resnet_blocks=ga.get("resnet_blocks", 7),
        tanh=ga.get("tanh", True),
        append_smoothers=ga.get("append_smoothers", True),
        input_channels=base_ch + (1 if use_mask else 0)
        + (2 if use_pos else 0),
        disc_filters=d.get("num_filters", 12),
        disc_layers=d.get("n_layers", 2),
        lr=og.get("lr", 4e-4),
        weight_decay=og.get("weight_decay", 1e-5),
        batch_size=tr.get("batch_size", 40),
        patch_size=tr.get("patch_size", 32),
        reconstruction_weight=tr.get("reconstruction_weight", 4.0),
        perception_weight=pl.get("weight", 6.0),
        adversarial_weight=tr.get("adversarial_weight", 0.5),
        log_interval=tr.get("log_interval", 1000),
        epochs=tr.get("epochs", 3),
        use_image_loss=tr.get("use_image_loss", True),
    )
    kw.update(overrides)
    extras = {"pre_dir": tr.get("pre_dir"), "post_name": tr.get("post_name"),
              "root_dir": job.get("root_dir")}
    return gan.GANConfig(**kw), extras


def make_config(stage: int, use_mask: bool = True, use_pos: bool = True,
                **overrides) -> gan.GANConfig:
    s = stage_settings(stage, use_mask, use_pos)
    return gan.GANConfig(
        generator=s["generator"],
        input_channels=_input_channels(use_mask, use_pos),
        epochs=s["epochs"],
        **overrides)


def pre_dir_for_stage(stage: int, use_mask: bool, use_pos: bool) -> str:
    if stage == 1:
        return "color"
    return res_dir_name(1, use_mask, use_pos)


def post_path_for_stage(paths: UidPaths, stage: int) -> str:
    if stage == 1:
        p = paths.inpainted
        if not os.path.exists(p):
            p = paths.texture_with_bg  # reference fallback (data.py:80-81)
        return p
    return paths.texture_with_bg


_FRAME_CACHE_CAP = 512    # u8 frames (~1.8 MB each at 512²) — bounds host RAM


_PREWARMED: set = set()


def prewarm(hw: int = 512, use_mask: bool = True, use_pos: bool = True
            ) -> float:
    """Force the per-process loads of the canonical stage-3 device programs
    (same cold-start rationale as stage2_recon.prewarm): the stage-1 and
    stage-2 train steps — ONE program each across all uids now that the
    midpoint list is bucket-padded — and the u8 full-frame eval runner.
    Once per process per (config, hw); returns elapsed seconds (0 = warm)."""
    from drawingspinup_tpu.pipelines.stage3_data import KeyframeData

    t0 = time.time()
    ran = False
    n_dev = len(jax.devices())
    for stage in (1, 2):
        # the EXACT config the production CLIs build (train_stage{1,2}.py
        # load the reference yamls) — a near-miss cfg would warm a
        # different jit static key and load a different program
        cfg, _ = gan_config_from_yaml(DEFAULT_STAGE_CFGS[stage],
                                      use_mask=use_mask, use_pos=use_pos)
        key = (cfg, hw)
        if key in _PREWARMED:
            continue
        _PREWARMED.add(key)
        ran = True
        s = stage_settings(stage, use_mask, use_pos)
        w = hw * 2 if s["use_edge"] else hw   # edge aug doubles train width
        data = KeyframeData(
            pre=jnp.zeros((hw, w, cfg.input_channels), jnp.float32),
            post=jnp.zeros((hw, w, 3), jnp.float32),
            mask=jnp.ones((hw, w), jnp.float32),
            valid_yx=jnp.zeros((16384, 2), jnp.int32),
            n_valid=jnp.asarray(1, jnp.int32))
        state = gan.init_state(cfg, jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(1)
        if n_dev > 1:
            from drawingspinup_tpu.train import gan_parallel
            gan_parallel.production_train_step(cfg)(state, data, k)
        else:
            gan.train_step(cfg, state, data, k)
        # u8 full-frame runner (periodic eval + test_stage stylization)
        out = gan.generate_full_rgba_async(
            cfg, state, np.zeros((hw, hw, 7), np.uint8), use_mask, use_pos,
            s["use_edge"])
        np.asarray(out)
    dt = time.time() - t0
    if ran:
        print(f"[stage3] prewarm: programs loaded in {dt:.1f} s")
    return dt if ran else 0.0


def test_on_full_images(cfg: gan.GANConfig, state: gan.GANState,
                        render_root: str, actions: List[str], res_name: str,
                        use_mask: bool, use_pos: bool, use_edge: bool,
                        pre_dir: str,
                        frame_cache: Optional[dict] = None,
                        max_frames_per_action: Optional[int] = None
                        ) -> List[str]:
    """Run the generator over every frame of every action dir, writing RGBA
    results (reference trainers.py:213-232).

    frame_cache: optional dict reused across the periodic evals of one
    training run — the input features of every frame are identical at each
    eval, and their PNG decode + feature assembly dominated eval wall time
    on this 1-core host (~29 s/eval, PERF_NOTES r3)."""
    written = []
    # small pending queue: dispatch frame i+k before syncing frame i, so
    # device compute + tunnel D2H overlap host PNG decode/encode
    pending = []

    def flush_one():
        out_path, fut = pending.pop(0)
        write_image(out_path, np.asarray(fut))   # u8 RGBA straight to PNG
        written.append(out_path)

    for action in actions:
        action_dir = os.path.join(render_root, action)
        src = os.path.join(action_dir, pre_dir)
        if not os.path.isdir(src):
            continue
        out_dir = os.path.join(action_dir, res_name)
        os.makedirs(out_dir, exist_ok=True)
        fnames = [f for f in sorted(os.listdir(src)) if f.endswith(".png")]
        if max_frames_per_action is not None:
            # mid-training progress evals don't need every frame; the FINAL
            # eval (the one whose outputs feed the next stage / the GIF)
            # always runs unlimited (VERDICT r3 next #6)
            fnames = fnames[:max_frames_per_action]
        for fname in fnames:
            # key includes pre_dir/use_edge/use_pos so a caller reusing one
            # dict across differently-configured calls can't get stale
            # feature stacks (ADVICE r3)
            ck = (action, fname, pre_dir, use_edge, use_pos)
            if frame_cache is not None and ck in frame_cache:
                x_u8 = frame_cache[ck]
            else:
                x_u8 = stage3_data.load_full_frame_u8(
                    action_dir, fname, use_edge, pre_dir=pre_dir,
                    use_pos=use_pos)
                if frame_cache is not None \
                        and len(frame_cache) < _FRAME_CACHE_CAP:
                    frame_cache[ck] = x_u8
            pending.append((os.path.join(out_dir, fname),
                            gan.generate_full_rgba_async(
                                cfg, state, x_u8, use_mask, use_pos,
                                use_edge)))
            if len(pending) >= 3:
                flush_one()
    while pending:
        flush_one()
    return written


def train_stage(root: str, uid: str, stage: int, use_mask: bool = True,
                use_pos: bool = True, seed: int = 0,
                cfg: Optional[gan.GANConfig] = None,
                max_batches: Optional[int] = None,
                eval_actions: Optional[List[str]] = None) -> gan.GANState:
    paths = UidPaths(root, uid)
    s = stage_settings(stage, use_mask, use_pos)
    cfg = cfg or make_config(stage, use_mask, use_pos)
    render_root = paths.render_dir
    pre_dir = pre_dir_for_stage(stage, use_mask, use_pos)
    rest_dir = os.path.join(render_root, "rest_pose")
    if not os.path.isdir(rest_dir):
        rest_dir = os.path.join(render_root, "rest_rotate")

    data = stage3_data.load_keyframe_pair(
        rest_dir, pre_dir, post_path_for_stage(paths, stage),
        use_mask=use_mask, use_pos=use_pos, use_edge=s["use_edge"])

    log_dir = os.path.join(paths.mesh_dir,
                           log_name_for(stage, use_mask, use_pos))
    os.makedirs(log_dir, exist_ok=True)
    res_name = res_dir_name(stage, use_mask, use_pos)
    actions = eval_actions if eval_actions is not None else sorted(
        d for d in os.listdir(render_root)
        if os.path.isdir(os.path.join(render_root, d)))

    state = gan.init_state(cfg, jax.random.PRNGKey(seed))
    # real (unpadded) midpoint count defines the reference epoch budget
    n_valid = int(data.n_valid) if data.n_valid is not None \
        else int(data.valid_yx.shape[0])
    batches_per_epoch = max(n_valid // cfg.batch_size, 1)
    total = cfg.epochs * batches_per_epoch
    if max_batches is not None:
        total = min(total, max_batches)
    # multi-chip: patch batch data-parallel (same entry the dryrun runs)
    n_dev = len(jax.devices())
    if n_dev > 1:
        from drawingspinup_tpu.train import gan_parallel
        dp_step = gan_parallel.production_train_step(cfg)
        print(f"[stage{stage} {uid}] patch-dp over {n_dev} devices")
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    t_eval = t_ckpt = 0.0
    frame_cache: dict = {}   # eval inputs are identical across evals
    # NOTE: a lax.scan-chunked variant (25 steps/program) was measured e2e
    # and REVERTED — JAX's async dispatch already pipelines the tunnel, so
    # it bought nothing per-step and cost a 60-90 s scan compile per uid
    # frame shape (PERF_NOTES.md).
    for b in range(total):
        key, k = jax.random.split(key)
        if n_dev > 1:
            state, logs = dp_step(state, data, k)
        else:
            state, logs = gan.train_step(cfg, state, data, k)
        if (b + 1) % cfg.log_interval == 0:
            # float(logs[...]) is a D2H sync: all queued steps are done here,
            # so the eval/ckpt timers below measure only themselves
            print(f"[stage{stage} {uid}] batch {b + 1}/{total} "
                  f"g={float(logs['g_loss']):.4f} "
                  f"d={float(logs['d_loss']):.4f}")
            tc = time.time()
            gan.save_checkpoint(log_dir, state, b + 1)
            te = time.time()
            test_on_full_images(cfg, state, render_root, actions, res_name,
                                use_mask, use_pos, s["use_edge"], pre_dir,
                                frame_cache=frame_cache,
                                max_frames_per_action=cfg.eval_frame_limit)
            t_ckpt += te - tc
            t_eval += time.time() - te
    tc = time.time()
    gan.save_checkpoint(log_dir, state, FINAL_STEP)
    te = time.time()
    test_on_full_images(cfg, state, render_root, actions, res_name,
                        use_mask, use_pos, s["use_edge"], pre_dir,
                        frame_cache=frame_cache)
    t_ckpt += te - tc
    t_eval += time.time() - te
    wall = time.time() - t0
    steps_wall = wall - t_eval - t_ckpt
    print(f"[stage{stage} {uid}] {total} batches in {wall:.1f}s "
          f"(steps {steps_wall:.1f}s = {1e3 * steps_wall / max(total, 1):.1f} "
          f"ms/step, eval {t_eval:.1f}s, ckpt {t_ckpt:.1f}s)")
    return state


def test_stage(root: str, uid: str, stage: int, use_mask: bool = True,
               use_pos: bool = True, model_id: int = FINAL_STEP,
               cfg: Optional[gan.GANConfig] = None) -> List[str]:
    paths = UidPaths(root, uid)
    s = stage_settings(stage, use_mask, use_pos)
    cfg = cfg or make_config(stage, use_mask, use_pos)
    log_dir = os.path.join(paths.mesh_dir,
                           log_name_for(stage, use_mask, use_pos))
    state = gan.init_state(cfg, jax.random.PRNGKey(0))
    state = gan.load_checkpoint(log_dir, state, model_id)
    render_root = paths.render_dir
    actions = sorted(d for d in os.listdir(render_root)
                     if os.path.isdir(os.path.join(render_root, d)))
    return test_on_full_images(
        cfg, state, render_root, actions,
        res_dir_name(stage, use_mask, use_pos), use_mask, use_pos,
        s["use_edge"], pre_dir_for_stage(stage, use_mask, use_pos))
