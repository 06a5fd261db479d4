"""Timed END-TO-END run at REFERENCE budgets on the real TPU: synthetic
512x512 drawing -> stylized GIF through every stage CLI, with a
stage-by-stage wall-clock table. This turns BASELINE.md's per-stage
estimate into one measured number.

Notes:
  * stage 2a runs the production-size UNet with random weights (no Wonder3D
    checkpoint ships in this environment); its outputs are then overwritten
    by analytic sphere views at 1024^2 (same file contract) so the
    downstream reconstruction optimizes something meaningful.
  * budgets: recon 3000 steps / mc512 / 50k faces; style stage1 3 epochs +
    stage2 2 epochs at batch 40x32^2 (epoch = n_valid_pixels/40).
  * wall-clock includes any XLA compiles not already in the persistent
    cache AND the remote service's per-process first-execution program
    loads (PERF_NOTES.md). --marginal runs a SECOND character in the same
    process, measuring the amortized per-character cost a sweep pays.

Usage: python scripts/e2e_timed.py [--root /tmp/e2e_full] [--skip-recon]
       [--tiny] [--marginal]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import numpy as np

from drawingspinup_tpu.core import UidPaths
from drawingspinup_tpu.core.io import write_image

UID = "e2e_timed"
SIZE = 512


def make_drawing(root, uid):
    paths = UidPaths(root, uid)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    r = np.hypot(yy - SIZE / 2, xx - SIZE / 2)
    body = r < SIZE * 0.38
    ring = (r >= SIZE * 0.34) & (r < SIZE * 0.40)
    rgba = np.zeros((SIZE, SIZE, 4), np.float32)
    rgba[body] = [0.85, 0.55, 0.25, 1.0]
    rgba[ring] = [0.05, 0.05, 0.05, 1.0]
    write_image(paths.texture, rgba)
    write_image(paths.mask, (body | ring).astype(np.float32))
    tex_bg = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    write_image(paths.texture_with_bg, tex_bg)
    return paths


def run_character(uid, root, uid_file, times, tiny=False, skip_recon=False):
    """Full drawing->GIF chain for one uid through the stage CLIs."""
    paths = UidPaths(root, uid)

    def clock(name, fn):
        t0 = time.time()
        fn()
        times[name] = time.time() - t0
        print(f"### [{uid}] {name}: {times[name]:.1f}s", flush=True)

    mv_size = 64 if tiny else 1024

    # ---- stage 1: contour removal (production config) ----
    from drawingspinup_tpu.cli import predict
    s1_args = [predict.DEFAULT_CFG, "--uid", uid, "--root", root,
               "--batch-size", "1", "--size", str(SIZE)]
    if tiny:
        s1_args += ["generator.ngf=8", "generator.n_downsampling=2",
                    "generator.n_blocks=1"]
    clock("stage1_predict", lambda: predict.main(s1_args))

    # ---- stage 2a: 6-view x 2-domain diffusion, 75 steps, 256^2 -> 1024 ----
    from drawingspinup_tpu.cli import mv as mv_cli
    mv_args = ["--uid", uid, "--root", root, "--steps", "75"]
    if tiny:
        mv_args = ["--uid", uid, "--root", root, "--steps", "2",
                   "--size", "64", "--out-size", "64", "--tiny"]
    clock("stage2a_mv", lambda: mv_cli.main(mv_args))

    # substitute analytic sphere views (random-weight diffusion output is
    # not reconstructable); same file contract at the same resolution
    from drawingspinup_tpu.utils.synthetic import write_sphere_mv
    clock("(sphere_mv_fixture)", lambda: write_sphere_mv(
        root, uid, size=mv_size))

    # ---- stage 2b: NSR recon, full budget ----
    if not skip_recon:
        from drawingspinup_tpu.cli import recon as recon_cli
        recon_args = ["--uid", uid, "--root", root,
                      f"dataset.uid_list_file={uid_file}"]
        if tiny:
            from test_stage2_pipeline import TINY_OVERRIDES
            recon_args += TINY_OVERRIDES
        clock("stage2b_recon", lambda: recon_cli.main(recon_args))

    objs = [f for f in os.listdir(paths.mesh_dir) if f.endswith(".obj")]
    assert objs, "no mesh produced"

    # ---- stage 3: rig + render passes (rest pose + one action) ----
    from test_fbx_render import make_rig_fbx
    os.makedirs(paths.fbx_dir, exist_ok=True)
    make_rig_fbx(os.path.join(paths.fbx_dir, "rest_pose.fbx"), animate=False)
    make_rig_fbx(os.path.join(paths.fbx_dir, "spin.fbx"), animate=True)

    from drawingspinup_tpu.cli import run_render
    clock("stage3_render_rest", lambda: run_render.main(
        ["--uid", uid, "--data_dir", root]))
    clock("stage3_render_actions", lambda: run_render.main(
        ["--uid", uid, "--data_dir", root, "--test"]))

    # ---- stage 3: style training at reference budgets ----
    from drawingspinup_tpu.cli import train_stage1, train_stage2
    extra = ["--max-batches", "3"] if tiny else []
    clock("stage3_train1_3ep", lambda: train_stage1.main(
        ["--uid", uid, "--root", root] + extra))
    clock("stage3_train2_2ep", lambda: train_stage2.main(
        ["--uid", uid, "--root", root] + extra))

    from drawingspinup_tpu.cli import test_stage2
    clock("stage3_stylize", lambda: test_stage2.main(
        ["--uid", uid, "--root", root]))

    from drawingspinup_tpu.cli import gif_writer
    clock("gif", lambda: gif_writer.main(["--uid", uid, "--root", root]))

    gifs = os.listdir(paths.gif_dir)
    assert gifs and os.path.getsize(os.path.join(paths.gif_dir, gifs[0]))


def report(label, times):
    total = sum(v for k, v in times.items() if not k.startswith("("))
    print(f"\n=== {label} (reference budgets, single v5e chip) ===")
    for k, v in times.items():
        print(f"{k:24s} {v:8.1f} s")
    print(f"{'TOTAL':24s} {total:8.1f} s  = {total/60:.1f} min/character")
    return total


def main():
    # bench context: no real VGG19/ISNet weights ship in this environment;
    # timing is weight-independent (core/weights_policy.py opt-in)
    os.environ.setdefault("DSU_ALLOW_DEGRADED_WEIGHTS", "1")
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/e2e_full")
    ap.add_argument("--skip-recon", action="store_true",
                    help="reuse an existing mesh from a previous run")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test the harness with toy budgets (CPU-ok)")
    ap.add_argument("--marginal", action="store_true",
                    help="run a second character in-process to measure the "
                         "amortized (sweep) per-character cost")
    args = ap.parse_args()
    root = args.root
    os.makedirs(root, exist_ok=True)
    uids = [UID] + ([UID + "_2"] if args.marginal else [])
    # resume contamination guard: recon auto-resumes from per-uid
    # checkpoints, so a reused root reports a ~0-step "recon" time
    for uid in uids:
        ck = os.path.join(root, uid, "mesh", "ckpt")
        if not args.skip_recon and os.path.isdir(ck):
            print(f"WARNING: {ck} exists — recon will RESUME and the "
                  "timing is NOT a cold/marginal number. Use a fresh "
                  "--root.", flush=True)
    for uid in uids:
        make_drawing(root, uid)
    uid_file = os.path.join(root, "uids.json")
    with open(uid_file, "w") as f:
        json.dump(uids, f)

    all_times = {}
    for uid in uids:
        all_times[uid] = {}
        run_character(uid, root, uid_file, all_times[uid],
                      tiny=args.tiny, skip_recon=args.skip_recon)

    total = report("END-TO-END (cold)", all_times[uids[0]])
    out = {"metric": "e2e_minutes_per_character",
           "value": round(total / 60, 2), "unit": "min",
           "stages": {k: round(v, 1) for k, v in all_times[uids[0]].items()}}
    if args.marginal:
        marg = report("MARGINAL second character", all_times[uids[1]])
        out["marginal_minutes_per_character"] = round(marg / 60, 2)
        out["marginal_stages"] = {k: round(v, 1)
                                  for k, v in all_times[uids[1]].items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
