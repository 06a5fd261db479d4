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
    ap.add_argument("--config", default=None,
                    help="reference-format mvdiffusion-joint-ortho-6views"
                         ".yaml (default: packaged copy)")
    ap.add_argument("--uid", required=True)
    ap.add_argument("--root", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="local diffusers-layout Wonder3D checkpoint dir")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=None,
                    help="classifier-free guidance scale (default from "
                         "config pipe_validation_kwargs.guidance_scale; "
                         "!= 1.0 doubles the UNet batch per step)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--out-size", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="small UNet/CLIP for smoke tests")
    args = ap.parse_args(argv)

    # reference-format config supplies the defaults; CLI flags override
    # (reference mv.py:21-26 dotlist semantics)
    from drawingspinup_tpu.core import load_config
    cfg_path = args.config or os.path.join(
        os.path.dirname(__file__), "..", "configs",
        "mvdiffusion-joint-ortho-6views.yaml")
    ycfg = load_config(cfg_path)
    pvk = ycfg.get("pipe_validation_kwargs", {})
    vds = ycfg.get("validation_dataset", {})
    args.root = args.root or ycfg.get("data_root")
    args.ckpt = args.ckpt or ycfg.get("pretrained_model_name_or_path")
    args.steps = args.steps if args.steps is not None \
        else int(pvk.get("num_inference_steps", 75))
    args.seed = args.seed if args.seed is not None \
        else int(ycfg.get("seed", 42))
    args.size = args.size if args.size is not None \
        else int(vds.get("img_wh", [256, 256])[0])
    args.out_size = args.out_size if args.out_size is not None \
        else int(ycfg.get("resolution", [1024, 1024])[0])

    import dataclasses

    import jax

    from drawingspinup_tpu.pipelines import stage2_mv as mv

    unet_kw = {}
    if args.tiny:
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        from drawingspinup_tpu.models.vae import VAEConfig
        unet_kw["unet"] = UNetMVConfig(block_out_channels=(32, 64, 64, 64),
                                       attention_heads=4,
                                       cross_attention_dim=32)
        unet_kw["vae"] = VAEConfig(block_out_channels=(8, 8, 8, 8),
                                   layers_per_block=1)
    guidance = args.guidance if args.guidance is not None \
        else float(pvk.get("guidance_scale", 1.0))
    cfg = mv.MVPipelineConfig(num_inference_steps=args.steps,
                              image_size=args.size, out_size=args.out_size,
                              eta=float(pvk.get("eta", 1.0)),
                              guidance_scale=guidance,
                              **unet_kw)
    # cache the pipeline across main() calls: a sweep invokes this CLI
    # per uid in one process, and re-initializing the SD-scale models
    # costs ~20-30 s each time
    # key includes the checkpoint mtime so a regenerated file at the same
    # path invalidates the cache (ADVICE r1)
    ckpt_mtime = os.path.getmtime(args.ckpt) \
        if args.ckpt and os.path.exists(args.ckpt) else None
    cache_key = (args.ckpt, ckpt_mtime, args.steps, args.size, args.out_size,
                 args.tiny, guidance)
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
