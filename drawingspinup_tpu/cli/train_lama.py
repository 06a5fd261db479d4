"""Stage-1 training CLI — train the FFC-ResNet contour remover on rendered
3DBiCar data (the reference trained this offline in LaMa; see
``train/lama.py``). Also exposes the batch renderer:
``--render`` first renders the training data from OBJ models."""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True,
                    help="rendered BiCar data root (rgba + contour pngs)")
    ap.add_argument("--uid-json", required=True)
    ap.add_argument("--out", default="experiments/lama")
    ap.add_argument("--steps", type=int, default=3600)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--adversarial-weight", type=float, default=0.0)
    ap.add_argument("--render", default=None,
                    help="OBJ model root: render training data first")
    ap.add_argument("--render-limit", type=int, default=None)
    args = ap.parse_args(argv)

    if args.render:
        from drawingspinup_tpu.render.bicar import batch_render
        done = batch_render(args.render, args.data_root, args.uid_json,
                            limit=args.render_limit)
        print(f"rendered {len(done)} objects")

    import jax
    import numpy as np

    from drawingspinup_tpu.core import checkpoint as ckpt
    from drawingspinup_tpu.pipelines.stage1_data import BiCarDataset
    from drawingspinup_tpu.train import lama

    cfg = lama.LamaTrainConfig(batch_size=args.batch_size, steps=args.steps,
                               adversarial_weight=args.adversarial_weight)
    ds = BiCarDataset(args.data_root, args.uid_json, "train",
                  crop_size=args.size,
                  load_size=int(args.size * 572 / 512))
    state = lama.init_state(cfg, jax.random.PRNGKey(0), size=args.size)
    key = jax.random.PRNGKey(1)
    import jax.numpy as jnp
    for step, batch in enumerate(ds.batches(cfg.batch_size)):
        if step >= cfg.steps:
            break
        key, k = jax.random.split(key)
        state, logs = lama.train_step(
            cfg, state, {k2: jnp.asarray(v) for k2, v in batch.items()}, k)
        if step % 100 == 0:
            print(f"step {step}: g={float(logs['g_loss']):.4f} "
                  f"bce={float(logs['bce']):.4f}")
    os.makedirs(args.out, exist_ok=True)
    ckpt.save(os.path.join(args.out, f"step_{cfg.steps}"),
              {"params": state.g_params, "batch_stats": state.g_stats})
    print(json.dumps({"saved": os.path.join(args.out, f"step_{cfg.steps}")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
