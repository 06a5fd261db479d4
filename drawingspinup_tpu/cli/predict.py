"""Stage-1 CLI — contour removal over a uid list.

Same user surface as the reference ``1_lama_contour_remover/predict.py``:
``python -m drawingspinup_tpu.cli.predict [config.yaml] [key=value ...]``
with the reference's config knobs (indir, uid_json, generator.*, pretrained.*).
Extra flags: ``--uid`` to restrict to one uid, ``--batch-size``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

from drawingspinup_tpu.core import Config, load_config, load_uid_list
from drawingspinup_tpu.core import checkpoint as ckpt
from drawingspinup_tpu.pipelines import stage1

_VAR_CACHE: dict = {}


DEFAULT_CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                           "lama-fourier.yaml")


def load_variables(cfg: Config, model, sample_shape=(1, 64, 64, 4)):
    """Load generator weights: orbax dir, torch .ckpt/.pth (converted), or
    random init when no checkpoint is configured (smoke/test mode)."""
    pre = cfg.get("pretrained", Config())
    path = pre.get("path")
    gen_ck = pre.get("generator_checkpoint")
    full = os.path.join(path, gen_ck) if path and gen_ck else (path or None)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    # jitted init at a SMALL spatial size: the generator is fully
    # convolutional, so param shapes are independent of H/W. Eager init
    # dispatches the whole forward op-by-op through the device tunnel
    # (~8 min at 512²); jitted-at-512² compiles for ~16 min; jitted at 64²
    # is seconds and yields the identical param tree.
    init_vars = jax.jit(model.init)(rng, np.zeros(sample_shape, np.float32))
    if full and os.path.isdir(full):  # orbax checkpoint
        return ckpt.restore(full, init_vars)
    if full and os.path.isfile(full):  # torch state_dict
        import torch  # local import: torch is a conversion-only dependency
        from drawingspinup_tpu.utils import torch_port
        state = torch.load(full, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                 for k, v in state.items()}
        g = cfg.get("generator", Config())
        # converter mirrors build_generator's kind dispatch (lama-regular
        # loads a pix2pixhd_global checkpoint — reference lama-regular.yaml:8)
        convert = (torch_port.convert_global_generator
                   if g.get("kind", "ffc_resnet") == "pix2pixhd_global"
                   else torch_port.convert_ffc_generator)
        conv = convert(state,
                       n_downsampling=g.get("n_downsampling", 3),
                       n_blocks=g.get("n_blocks", 9))
        # overlay converted weights on the init tree (keeps any missing leaves)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(init_vars)
        conv_flat = tu.flatten_dict(conv)
        flat.update({k: v for k, v in conv_flat.items() if k in flat})
        return tu.unflatten_dict(flat)
    print("WARNING: no pretrained checkpoint found — using random init",
          file=sys.stderr)
    return init_vars


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default=DEFAULT_CFG)
    ap.add_argument("overrides", nargs="*", help="key.path=value overrides")
    ap.add_argument("--uid", default=None)
    ap.add_argument("--root", default=None, help="override dataset root (indir)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    root = args.root or cfg.get("indir")
    if args.uid:
        uids = [args.uid]
    else:
        uids = load_uid_list(cfg.get("uid_json"))
    # cache model+weights across main() calls (a sweep invokes this per uid
    # in one process; init+load costs ~5 s each time)
    pre = cfg.get("pretrained", Config())
    ck_full = os.path.join(pre.get("path") or "",
                           pre.get("generator_checkpoint") or "")
    # include the checkpoint mtime so a file regenerated at the same path
    # invalidates the cache (ADVICE r1)
    ck_mtime = os.path.getmtime(ck_full) if os.path.exists(ck_full) else None
    cache_key = (args.config, tuple(args.overrides), ck_mtime)
    if _VAR_CACHE.get("key") == cache_key:
        model, variables = _VAR_CACHE["mv"]
    else:
        model = stage1.build_generator(cfg)
        variables = load_variables(cfg, model)
        _VAR_CACHE["key"], _VAR_CACHE["mv"] = cache_key, (model, variables)
    written = stage1.predict_uids(root, uids, variables, cfg,
                                  batch_size=min(args.batch_size, len(uids)),
                                  size=args.size)
    print(json.dumps({"written": written}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
