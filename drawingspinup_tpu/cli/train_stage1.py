"""Stage-3 CLI — train the stage-1 style translator for one uid
(reference ``3_style_translator/train_stage1.py`` user surface)."""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--uid", required=True)
    ap.add_argument("--root", default=None)
    ap.add_argument("--config", default=None,
                    help="reference-format config_stage1.yaml "
                         "(default: packaged copy)")
    ap.add_argument("--no_mask", action="store_true")
    ap.add_argument("--no_pos", action="store_true")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--allow-degraded-weights", action="store_true",
                    help="train even without real VGG19 perceptual "
                         "weights (random-feature loss); by default "
                         "production training FAILS without them")
    args = ap.parse_args(argv)
    from drawingspinup_tpu.core import weights_policy
    weights_policy.set_strict(not args.allow_degraded_weights)
    from drawingspinup_tpu.pipelines import stage3_translate as st
    cfg, extras = st.gan_config_from_yaml(
        args.config or st.DEFAULT_STAGE_CFGS[1],
        use_mask=not args.no_mask, use_pos=not args.no_pos)
    from drawingspinup_tpu.train import gan
    gan.resolve_vgg_npz(cfg)  # fail fast in strict mode
    root = args.root or extras["root_dir"]
    st.train_stage(root, args.uid, 1, use_mask=not args.no_mask,
                   use_pos=not args.no_pos, cfg=cfg,
                   max_batches=args.max_batches)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
