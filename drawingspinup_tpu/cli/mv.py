"""Stage-2a CLI — multi-view generation per uid (reference ``mv.py`` surface).

``python -m drawingspinup_tpu.cli.mv --uid <uid> --root <preprocessed_root>
[--ckpt <wonder3d_dir>] [--steps 75] [--seed 42]``

Without ``--ckpt`` the model runs with random weights (smoke mode — the
Wonder3D checkpoint cannot be fetched from this environment; point --ckpt at
a locally downloaded diffusers-layout copy for real generation).
"""
from __future__ import annotations

import argparse
import json
import os

_PIPE_CACHE: dict = {}


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--uid", required=True)
    ap.add_argument("--root",
                    default="../dataset/AnimatedDrawings/preprocessed")
    ap.add_argument("--ckpt", default=None,
                    help="local diffusers-layout Wonder3D checkpoint dir")
    ap.add_argument("--steps", type=int, default=75)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out-size", type=int, default=1024)
    ap.add_argument("--tiny", action="store_true",
                    help="small UNet/CLIP for smoke tests")
    args = ap.parse_args(argv)

    import dataclasses

    import jax

    from drawingspinup_tpu.pipelines import stage2_mv as mv

    unet_kw = {}
    if args.tiny:
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        unet_kw["unet"] = UNetMVConfig(block_out_channels=(32, 64, 64, 64),
                                       attention_heads=4,
                                       cross_attention_dim=32)
    cfg = mv.MVPipelineConfig(num_inference_steps=args.steps,
                              image_size=args.size, out_size=args.out_size,
                              **unet_kw)
    # cache the pipeline across main() calls: a sweep invokes this CLI
    # per uid in one process, and re-initializing the SD-scale models
    # costs ~20-30 s each time
    # key includes the checkpoint mtime so a regenerated file at the same
    # path invalidates the cache (ADVICE r1)
    ckpt_mtime = os.path.getmtime(args.ckpt) \
        if args.ckpt and os.path.exists(args.ckpt) else None
    cache_key = (args.ckpt, ckpt_mtime, args.steps, args.size, args.out_size,
                 args.tiny)
    if _PIPE_CACHE.get("key") == cache_key:
        pipe = _PIPE_CACHE["pipe"]
    elif args.ckpt:
        pipe = mv.load_pretrained(cfg, args.ckpt)
    else:
        print("WARNING: no --ckpt given — running with random weights")
        pipe = mv.MVPipeline.init_random(cfg, jax.random.PRNGKey(0))
    _PIPE_CACHE["key"], _PIPE_CACHE["pipe"] = cache_key, pipe
    written = mv.generate_uid(args.root, args.uid, pipe, seed=args.seed)
    print(json.dumps({"written": len(written)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
