"""Per-stage fidelity report: OUR preprocessed outputs vs the REFERENCE's.

The parity bar (BASELINE.json north star) is LPIPS ≤ 0.02 per stage against
the reference's outputs for the golden toy uid (reference README.md:57-101).
This environment ships no reference outputs or pretrained weights, so the
bar cannot be evaluated here — this CLI makes it a one-command check the
moment a user has both trees:

    python -m drawingspinup_tpu.cli.fidelity \
        --ours /data/preprocessed --theirs /ref/preprocessed \
        --uid ff7ab74a67a443e3bda61e69577f4e80 \
        [--vgg-npz vgg19_features.npz]   # real-VGG perceptual (else random)

Compares every stage boundary of the per-uid contract that exists on both
sides — char/ffc_resnet_inpainted.png, mv/{color,normal,mask}/*,
blender_render/<action>/{res_stage1*,res_stage2*}/*, the recon mesh OBJs
(symmetric chamfer + nearest-neighbor vertex-color MSE) and the final GIFs
(frame-by-frame PSNR/SSIM) — and prints a JSON report with per-file metrics
plus per-stage aggregates. With meshes and GIFs included, one command now
covers the FULL per-uid artifact contract (reference README.md:57-101).
"""
from __future__ import annotations

import argparse
import json
import os


def _stage_dirs(root: str, uid: str):
    """(stage name, directory) pairs of the per-uid contract, SURVEY.md §1."""
    from drawingspinup_tpu.core import UidPaths
    p = UidPaths(root, uid)
    pairs = [("stage1_char", p.char_dir)]
    for sub in ("color", "normal", "mask"):
        pairs.append((f"stage2a_mv_{sub}", os.path.join(p.mv_dir, sub)))
    render = p.render_dir
    if os.path.isdir(render):
        for action in sorted(os.listdir(render)):
            adir = os.path.join(render, action)
            if not os.path.isdir(adir):
                continue
            for res in sorted(os.listdir(adir)):
                if res.startswith("res_stage"):
                    pairs.append((f"stage3_{action}_{res}",
                                  os.path.join(adir, res)))
    return pairs


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--theirs", required=True)
    ap.add_argument("--uid", required=True)
    ap.add_argument("--vgg-npz", default=None,
                    help="real VGG19 weights (scripts/export_vgg19_npz.py) "
                         "for the perceptual metric; random features "
                         "otherwise (relative comparisons only)")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args(argv)

    if args.vgg_npz:
        os.environ.setdefault("DSU_VGG19_NPZ", args.vgg_npz)

    from drawingspinup_tpu.core import UidPaths
    from drawingspinup_tpu.utils.quality import (
        compare_gif, compare_mesh, compare_stage_outputs,
    )

    report = {}
    for stage, ours_dir in _stage_dirs(args.ours, args.uid):
        theirs_dir = ours_dir.replace(args.ours, args.theirs, 1)
        if not (os.path.isdir(ours_dir) and os.path.isdir(theirs_dir)):
            continue
        files = compare_stage_outputs(ours_dir, theirs_dir)
        scored = [v for v in files.values() if "psnr" in v]
        agg = {}
        if scored:
            agg = {k: sum(v[k] for v in scored) / len(scored)
                   for k in ("psnr", "ssim", "perceptual")}
        report[stage] = {"files": files, "aggregate": agg,
                         "n": len(scored)}

    ours_p = UidPaths(args.ours, args.uid)
    theirs_p = UidPaths(args.theirs, args.uid)

    # recon meshes: every same-named OBJ (chamfer + vertex-color MSE)
    if os.path.isdir(ours_p.mesh_dir) and os.path.isdir(theirs_p.mesh_dir):
        meshes = {}
        for name in sorted(os.listdir(ours_p.mesh_dir)):
            if not name.endswith(".obj"):
                continue
            pb = os.path.join(theirs_p.mesh_dir, name)
            if not os.path.exists(pb):
                meshes[name] = {"missing": True}
                continue
            meshes[name] = compare_mesh(
                os.path.join(ours_p.mesh_dir, name), pb)
        if meshes:
            report["stage2b_mesh"] = {"files": meshes}

    # final GIFs: frame-by-frame
    if os.path.isdir(ours_p.gif_dir) and os.path.isdir(theirs_p.gif_dir):
        gifs = {}
        for name in sorted(os.listdir(ours_p.gif_dir)):
            if not name.endswith(".gif"):
                continue
            pb = os.path.join(theirs_p.gif_dir, name)
            if not os.path.exists(pb):
                gifs[name] = {"missing": True}
                continue
            r = compare_gif(os.path.join(ours_p.gif_dir, name), pb)
            del r["frames"]      # keep the report compact; aggregate stays
            gifs[name] = r
        if gifs:
            report["gif"] = {"files": gifs}

    # degraded-weights modes hit while computing metrics in THIS process
    # (e.g. random-VGG perceptual distance) — honesty marker for the report
    from drawingspinup_tpu.core import weights_policy
    if weights_policy.degradations():
        report["degraded_weights"] = weights_policy.degradations()

    def sanitize(o):
        """inf/nan → strings: bare Infinity is not RFC JSON, and the
        exact-match case (PSNR = inf) is this tool's headline success."""
        import math
        if isinstance(o, dict):
            return {k: sanitize(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [sanitize(v) for v in o]
        if isinstance(o, float) and not math.isfinite(o):
            return "inf" if o > 0 else ("-inf" if o < 0 else "nan")
        return o

    text = json.dumps(sanitize(report), indent=2, default=float)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
