"""Full-pipeline batch CLI: drawing → GIF for every uid in a list.

``python -m drawingspinup_tpu.cli.sweep --root <preprocessed> --uids u.json
[--stages stage1,recon,render,train_style,gif] [--shard 0/4]``

Each stage reuses the corresponding single-uid pipeline; failures are
isolated per uid and logged to sweep_log.jsonl (see pipelines/sweep.py).
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--uids", required=True)
    ap.add_argument("--stages",
                    default="stage1,mv,recon,render,train_style,gif")
    ap.add_argument("--shard", default="0/1", help="index/num_shards")
    ap.add_argument("--mode", choices=("throughput", "latency"),
                    default=None,
                    help="multi-chip strategy: 'throughput' shards UIDS "
                         "across chips (one sweep process per chip via "
                         "--pin-chip k --shard k/8 — uids are "
                         "embarrassingly parallel; best min/char amortized "
                         "over a batch); 'latency' runs EACH uid "
                         "data-parallel over all local chips (fastest "
                         "single character; sub-linear — the reference "
                         "ray/patch budgets underfill 8 chips, see "
                         "BASELINE.md single-character latency table). "
                         "Default: throughput when --pin-chip is given, "
                         "latency otherwise.")
    ap.add_argument("--pin-chip", type=int, default=None,
                    help="restrict this process to ONE local TPU chip "
                         "(sets TPU_VISIBLE_CHIPS before backend init). "
                         "The v5e-8 production pattern is 8 sweep "
                         "processes, --pin-chip k --shard k/8: uids are "
                         "embarrassingly parallel and per-uid training "
                         "at the reference ray budget underfills a "
                         "multi-chip dp mesh (256 rays/device at dp=8).")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--recon-overrides", nargs="*", default=[])
    ap.add_argument("--allow-degraded-weights", action="store_true",
                    help="run even when real pretrained weights (VGG19 "
                         "perceptual, ...) are missing; by default a "
                         "production sweep FAILS rather than silently "
                         "training with random features")
    args = ap.parse_args(argv)

    from drawingspinup_tpu.core import weights_policy
    weights_policy.set_strict(not args.allow_degraded_weights)
    if "train_style" in args.stages.split(","):
        from drawingspinup_tpu.pipelines import stage3_translate as st
        from drawingspinup_tpu.train import gan as gan_mod
        cfg, _ = st.gan_config_from_yaml(st.DEFAULT_STAGE_CFGS[1])
        gan_mod.resolve_vgg_npz(cfg)  # fail fast in strict mode

    # mode/pin-chip consistency: 'throughput' = uid-sharded one-chip
    # processes; 'latency' = every stage data-parallel over all local chips
    # (the pipelines' n_devices>1 production paths engage automatically)
    if args.mode == "throughput" and args.pin_chip is None:
        ap.error("--mode throughput requires --pin-chip k (one sweep "
                 "process per chip, --shard k/n)")
    if args.mode == "latency" and args.pin_chip is not None:
        ap.error("--mode latency uses ALL local chips per uid — drop "
                 "--pin-chip")
    if args.pin_chip is not None:
        # must happen BEFORE the backend initializes
        os.environ["TPU_VISIBLE_CHIPS"] = str(args.pin_chip)
        os.environ["TPU_PROCESS_BOUNDS"] = "1,1,1"
        os.environ["TPU_CHIPS_PER_PROCESS_BOUNDS"] = "1,1,1"
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()

    shard_index, num_shards = (int(x) for x in args.shard.split("/"))
    stages = args.stages.split(",")

    from drawingspinup_tpu.pipelines import sweep as sweep_mod

    def stage1(uid):
        from drawingspinup_tpu.cli import predict
        predict.main(["--uid", uid, "--root", args.root])

    def mv(uid):
        from drawingspinup_tpu.cli import mv as mv_cli
        mv_cli.main(["--uid", uid, "--root", args.root])

    def recon(uid):
        from drawingspinup_tpu.cli import recon as recon_cli
        recon_cli.main(["--uid", uid, "--root", args.root]
                       + args.recon_overrides)

    def render(uid):
        from drawingspinup_tpu.cli import run_render
        run_render.main(["--uid", uid, "--data_dir", args.root])
        run_render.main(["--uid", uid, "--data_dir", args.root, "--test"])

    def train_style(uid):
        from drawingspinup_tpu.cli import train_stage1, train_stage2
        train_stage1.main(["--uid", uid, "--root", args.root])
        train_stage2.main(["--uid", uid, "--root", args.root])

    def test_style(uid):
        from drawingspinup_tpu.cli import test_stage1, test_stage2
        test_stage1.main(["--uid", uid, "--root", args.root])
        test_stage2.main(["--uid", uid, "--root", args.root])

    def gif(uid):
        from drawingspinup_tpu.cli import gif_writer
        gif_writer.main(["--uid", uid, "--root", args.root])

    all_fns = {"stage1": stage1, "mv": mv, "recon": recon, "render": render,
               "train_style": train_style, "test_style": test_style,
               "gif": gif}
    fns = {s: all_fns[s] for s in stages}

    # cold-start: the recon / stage-3 device programs take ~100-200 s of
    # per-process first-execution loads (PERF_NOTES r4). When earlier
    # stages run first, kick the prewarms off NOW (one background thread,
    # pipeline order) so those loads overlap the earlier stages' compute
    # instead of each stage's own first uid.
    def _prewarm_later_stages():
        if "recon" in stages and stages[0] != "recon":
            from drawingspinup_tpu.core import load_config
            from drawingspinup_tpu.cli.recon import DEFAULT_CFG
            from drawingspinup_tpu.pipelines import stage2_recon
            cfg_yaml = load_config(DEFAULT_CFG, args.recon_overrides)
            nsr_cfg = stage2_recon.nsr_config_from_yaml(cfg_yaml)
            if nsr_cfg.max_steps >= 1000:
                iso = cfg_yaml.get("model", {}).get("geometry", {}) \
                    .get("isosurface", {})
                stage2_recon.prewarm(
                    nsr_cfg,
                    im_size=cfg_yaml.dataset.get("imSize", [1024, 1024])[0],
                    mc_resolution=iso.get("resolution", 512))
        if "train_style" in stages and stages[0] != "train_style":
            from drawingspinup_tpu.pipelines import stage3_translate
            stage3_translate.prewarm()

    if ("recon" in stages or "train_style" in stages) \
            and stages[0] not in ("recon", "train_style"):
        import threading

        from drawingspinup_tpu.core import load_config
        from drawingspinup_tpu.cli.recon import DEFAULT_CFG
        from drawingspinup_tpu.pipelines import stage2_recon
        from drawingspinup_tpu.train import nsr
        if "recon" in stages:
            # populate the memoized optimizer before the thread races the
            # recon loop for it (different tx objects = different programs)
            nsr.make_optimizer(stage2_recon.nsr_config_from_yaml(
                load_config(DEFAULT_CFG, args.recon_overrides)))
        threading.Thread(target=_prewarm_later_stages, daemon=True).start()
    result = sweep_mod.run_sweep(args.root, args.uids, fns,
                                 shard_index=shard_index,
                                 num_shards=num_shards,
                                 resume=not args.no_resume)
    print(json.dumps({k: len(v) for k, v in result.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
