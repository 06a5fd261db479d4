"""Stage-2b CLI — NSR reconstruction per uid.

Same user surface as the reference ``2_charactor_reconstructor/recon.py``:
``python -m drawingspinup_tpu.cli.recon --uid <uid> [--config path.yaml]
[key=value ...]``; with no ``--uid`` it sweeps the uid list, enabling
thinning for uids in the thinning list (reference recon.py:53-66).
"""
from __future__ import annotations

import argparse
import json
import os

from drawingspinup_tpu.core import Config, load_config, load_uid_list
from drawingspinup_tpu.pipelines import stage2_recon

DEFAULT_CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                           "neus-ortho.yaml")


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=DEFAULT_CFG)
    ap.add_argument("--uid", default=None)
    ap.add_argument("--root", default=None)
    ap.add_argument("--prewarm", choices=("auto", "on", "off"),
                    default="auto",
                    help="background-load the device programs for the "
                         "canonical shapes while data loads (cold-start "
                         "mitigation; auto = on at production budgets)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    root = args.root or cfg.dataset.data_root
    thin_file = cfg.dataset.get("thinning_uid_list_file")
    thinning_uids = set(load_uid_list(thin_file)) \
        if thin_file and os.path.exists(thin_file) else set()
    uids = [args.uid] if args.uid else load_uid_list(cfg.dataset.uid_list_file)

    nsr_cfg = stage2_recon.nsr_config_from_yaml(cfg)
    exp = cfg.get("export", Config())
    geo = cfg.get("model", Config()).get("geometry", Config())
    iso = geo.get("isosurface", Config())

    # cold-start prewarm: dispatch the canonical device programs from a
    # background thread so the per-process first-execution loads overlap
    # data IO + phase-1 training (stage2_recon.prewarm)
    prewarm_thread = None
    if args.prewarm == "on" or (args.prewarm == "auto"
                                and nsr_cfg.max_steps >= 1000):
        import threading

        from drawingspinup_tpu.train import nsr
        # populate the memoized optimizer BEFORE the thread races recon_uid
        # for it: a concurrent lru_cache miss could hand each caller a
        # different tx object → different jit static keys → the prewarmed
        # program would not be the one the real loop runs
        nsr.make_optimizer(nsr_cfg)
        im_size = cfg.dataset.get("imSize", [1024, 1024])[0]
        mc_res = iso.get("resolution", 512)
        prewarm_thread = threading.Thread(
            target=stage2_recon.prewarm, args=(nsr_cfg,),
            kwargs=dict(im_size=im_size, mc_resolution=mc_res), daemon=True)
        prewarm_thread.start()

    # multi-uid: overlap each uid's host-side mesh tail (carve/march/remesh/
    # save, ~25-40 s) with the next uid's device training
    from concurrent.futures import Future, ThreadPoolExecutor
    executor = ThreadPoolExecutor(max_workers=1) if len(uids) > 1 else None

    written = []
    for uid in uids:
        out = stage2_recon.recon_uid(
            root, uid, nsr_cfg, tail_executor=executor,
            mc_resolution=iso.get("resolution", 512),
            face_count=geo.get("face_count", 50000),
            thinning=bool(exp.get("thinning", True)) and uid in thinning_uids,
            thinning_type=exp.get("thinning_type", "double"),
            smoothing=exp.get("smoothing", True),
            shearing=exp.get("shearing", True),
            color_back_projection=exp.get("color_back_projection", True),
            ortho_scale=exp.get("ortho_scale", 1.35),
            front_cutting=geo.get("front_cutting", True),
            seed=cfg.get("seed", 123456),
            im_size=cfg.dataset.get("imSize", [1024, 1024])[0],
            export_uv=exp.get("export_uv", False),
        )
        written.append(out)
    paths, failed = [], []
    for uid, out in zip(uids, written):
        if isinstance(out, Future):
            try:
                paths.append(out.result())
            except Exception as e:  # per-uid isolation like the sweep
                failed.append(uid)
                print(f"[recon {uid}] export tail FAILED: {e}")
        else:
            paths.append(out)
    if executor is not None:
        executor.shutdown(wait=True)
    print(json.dumps({"written": paths, **({"failed": failed} if failed
                                           else {})}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
