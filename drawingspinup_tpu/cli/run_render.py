"""Stage-3 render CLI — the Blender-free ``run_render.py`` equivalent.

Same user surface as the reference ``3_style_translator/run_render.py``:
``--uid``, ``--data_dir``, ``--test``. Train mode renders ``rest_pose``;
test mode renders every other retargeted fbx under ``mesh/fbx_files``
(falling back to ``rest_rotate`` when none exist), writing
color/pos/edge passes per action. Jumping/zombie actions get the reference's
30° yaw (blender_animation.py:17-18).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time


YAW_ACTIONS = {"jumping", "zombie"}


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir",
                    default="../dataset/AnimatedDrawings/preprocessed")
    ap.add_argument("--uid", required=True)
    ap.add_argument("--test", action="store_true")
    args = ap.parse_args(argv)

    from drawingspinup_tpu.render.animation import render_animation

    input_dir = os.path.join(args.data_dir, args.uid, "mesh", "fbx_files")
    meshes = sorted(glob.glob(os.path.join(args.data_dir, args.uid, "mesh",
                                           "*.obj")))
    assert meshes, f"no reconstructed OBJ under {args.data_dir}/{args.uid}/mesh"
    mesh_file = meshes[0]

    if not args.test:
        actions = ["rest_pose"]
    else:
        actions = [f[:-4] for f in sorted(os.listdir(input_dir))
                   if f.endswith(".fbx")]
        if "rest_pose" in actions:
            actions.remove("rest_pose")
        if not actions:
            actions = ["rest_rotate"]

    stats = {}
    for action in actions:
        fbx_name = "rest_pose.fbx" if action in ("rest_pose", "rest_rotate") \
            else f"{action}.fbx"
        fbx_file = os.path.join(input_dir, fbx_name)
        out_dir = os.path.join(args.data_dir, args.uid, "mesh",
                               "blender_render", action)
        yaw = 30.0 if action in YAW_ACTIONS else 0.0
        # rest_rotate applies the rotated-camera fallback config
        if action == "rest_rotate":
            yaw = 30.0
        t0 = time.time()
        info = render_animation(fbx_file, mesh_file, out_dir, yaw_deg=yaw)
        dt = time.time() - t0
        n = max(info["frames"], 1)
        print(f"{action}: {info['frames']} frames at {info['size']}px, "
              f"{dt / n:.3f}s/frame")
        stats[action] = info
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
