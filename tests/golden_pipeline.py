"""Deterministic toy-uid pipeline for golden artifact regression pins.

Runs drawing → GIF through the REAL CLIs/pipelines at tiny budgets with
pinned seeds — the same flow as tests/test_e2e.py — and returns the uid's
artifact paths. `scripts/make_goldens.py` commits one run's artifacts under
tests/data/goldens/; `tests/test_goldens.py` re-runs the pipeline and
compares against them through `cli/fidelity.py` (VERDICT r4 weak #5: perf
retunes that shift pipeline artifacts beyond tolerance must fail CI).

Environment contract: must run under the SAME backend as the tests
(CPU, 8 virtual devices — tests/conftest.py); the generator script
replicates that env before importing jax.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

GOLDEN_UID = "toy_golden"
GOLDENS_ROOT = os.path.join(os.path.dirname(__file__), "data", "goldens",
                            "preprocessed")


def run_toy_pipeline(root: str, uid: str = GOLDEN_UID):
    """Drawing → GIF through the real stage CLIs; returns UidPaths."""
    from drawingspinup_tpu.core import UidPaths
    from drawingspinup_tpu.core.io import write_image

    paths = UidPaths(root, uid)
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    r = np.hypot(yy - size / 2, xx - size / 2)
    body = r < size * 0.38
    ring = (r >= size * 0.34) & (r < size * 0.40)
    rgba = np.zeros((size, size, 4), np.float32)
    rgba[body] = [0.85, 0.55, 0.25, 1.0]
    rgba[ring] = [0.05, 0.05, 0.05, 1.0]
    write_image(paths.texture, rgba)
    write_image(paths.mask, (body | ring).astype(np.float32))
    tex_bg = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    write_image(paths.texture_with_bg, tex_bg)
    uid_file = os.path.join(root, f"{uid}_uids.json")
    with open(uid_file, "w") as f:
        json.dump([uid], f)

    # stage 1: contour removal (seeded random init — deterministic)
    from drawingspinup_tpu.cli import predict
    rc = predict.main([
        predict.DEFAULT_CFG,
        "--uid", uid, "--root", root, "--batch-size", "1", "--size", "64",
        "generator.ngf=8", "generator.n_downsampling=2",
        "generator.n_blocks=1",
    ])
    assert rc == 0

    # stage 2a contract: analytic sphere views (same substitution as
    # tests/test_e2e.py — random-weight diffusion output is not meaningful
    # downstream; mv numerics are pinned separately by
    # tests/data/mv_tiny_expected.npz)
    from drawingspinup_tpu.utils.synthetic import write_sphere_mv
    write_sphere_mv(root, uid, size=64)

    # stage 2b: recon at tiny budgets
    from drawingspinup_tpu.cli import recon as recon_cli
    from test_stage2_pipeline import TINY_OVERRIDES
    rc = recon_cli.main(["--uid", uid, "--root", root,
                         f"dataset.uid_list_file={uid_file}"]
                        + TINY_OVERRIDES)
    assert rc == 0

    # stage 3: rig + render + tiny style training + gif
    from test_fbx_render import make_rig_fbx
    os.makedirs(paths.fbx_dir, exist_ok=True)
    make_rig_fbx(os.path.join(paths.fbx_dir, "rest_pose.fbx"), animate=False)
    from drawingspinup_tpu.cli import run_render
    rc = run_render.main(["--uid", uid, "--data_dir", root])
    assert rc == 0

    from drawingspinup_tpu.pipelines import stage3_translate as st
    from drawingspinup_tpu.train import gan
    tiny = gan.GANConfig(generator="GeneratorJ",
                         filters=(8, 16, 16, 16, 16, 8), resnet_blocks=1,
                         batch_size=4, patch_size=16, input_channels=6,
                         log_interval=10 ** 9)
    st.train_stage(root, uid, 1, cfg=tiny, max_batches=3)

    from drawingspinup_tpu.cli import gif_writer
    rc = gif_writer.main(["--uid", uid, "--root", root])
    assert rc == 0
    return paths


def mesh_stats(paths) -> dict:
    """V/F counts of every exported OBJ (coarse drift detector)."""
    from drawingspinup_tpu.core.io import read_obj
    out = {}
    for name in sorted(os.listdir(paths.mesh_dir)):
        if name.endswith(".obj"):
            v, f, _ = read_obj(os.path.join(paths.mesh_dir, name))
            out[name] = {"n_verts": int(len(v)), "n_faces": int(len(f))}
    return out
