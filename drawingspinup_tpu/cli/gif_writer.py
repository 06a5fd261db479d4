"""Final CLI — assemble stylized frames into looping GIFs per action
(reference ``3_style_translator/gif_writer.py``: res_stage2_* preferred,
res_stage1_* fallback; 30 ms/frame, disposal=2)."""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--uid", required=True)
    ap.add_argument("--root", default="../dataset/AnimatedDrawings/preprocessed")
    ap.add_argument("--duration-ms", type=int, default=30)
    args = ap.parse_args(argv)

    from drawingspinup_tpu.core import UidPaths, list_actions
    from drawingspinup_tpu.core.io import read_image, write_gif

    paths = UidPaths(args.root, args.uid)
    written = []
    for action in list_actions(paths):
        action_dir = paths.action_dir(action)
        res = None
        for cand in sorted(os.listdir(action_dir), reverse=True):
            if cand.startswith("res_stage2"):
                res = cand
                break
        if res is None:
            for cand in sorted(os.listdir(action_dir), reverse=True):
                if cand.startswith("res_stage1"):
                    res = cand
                    break
        if res is None:
            continue
        frame_dir = os.path.join(action_dir, res)
        frames = [read_image(os.path.join(frame_dir, f))
                  for f in sorted(os.listdir(frame_dir))
                  if f.endswith(".png")]
        if not frames:
            continue
        # composite on white for GIF
        out = []
        for fr in frames:
            if fr.shape[-1] == 4:
                a = fr[..., 3:4]
                fr = fr[..., :3] * a + (1 - a)
            out.append(fr)
        gif_path = paths.gif(action)
        write_gif(gif_path, out, duration_ms=args.duration_ms)
        written.append(gif_path)
    print(json.dumps({"written": written}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
