"""Toy-uid end-to-end test: drawing → GIF through every stage's real CLI,
orchestrated by the sweep pipeline (the reference's golden-artifact check,
SURVEY.md §4, rebuilt as an executable test). Tiny configs keep it CPU-sized;
stage 2a runs with random weights (no Wonder3D checkpoint in this
environment) and its outputs are then OVERWRITTEN by analytic sphere views so
the downstream reconstruction remains meaningful.
"""
import json
import os
import sys

import numpy as np
import pytest

from drawingspinup_tpu import native
from drawingspinup_tpu.core import UidPaths
from drawingspinup_tpu.core.io import read_image, write_image, write_obj

sys.path.insert(0, os.path.dirname(__file__))

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")]

UID = "toy_e2e"


def make_drawing(root, size=64):
    paths = UidPaths(root, UID)
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
    return paths


def test_full_pipeline_toy_uid(tmp_path):
    root = str(tmp_path)
    paths = make_drawing(root)
    uid_file = tmp_path / "uids.json"
    uid_file.write_text(json.dumps([UID]))

    # ---- stage 1: contour removal CLI ----
    from drawingspinup_tpu.cli import predict
    rc = predict.main([
        predict.DEFAULT_CFG,
        "--uid", UID, "--root", root, "--batch-size", "1", "--size", "64",
        "generator.ngf=8", "generator.n_downsampling=2",
        "generator.n_blocks=1",
    ])
    assert rc == 0 and os.path.exists(paths.inpainted)

    # ---- stage 2a: mv CLI (random weights, tiny) ----
    from drawingspinup_tpu.cli import mv as mv_cli
    rc = mv_cli.main(["--uid", UID, "--root", root, "--steps", "2",
                      "--size", "64", "--out-size", "64", "--tiny"])
    assert rc == 0 and os.path.exists(paths.mv("color", "front"))

    # random-weight diffusion can't produce usable views — substitute the
    # analytic sphere renders (same file contract) for the recon stage
    from drawingspinup_tpu.utils.synthetic import write_sphere_mv
    write_sphere_mv(root, UID, size=64)

    # ---- stage 2b: recon CLI ----
    from drawingspinup_tpu.cli import recon as recon_cli
    from test_stage2_pipeline import TINY_OVERRIDES
    rc = recon_cli.main(["--uid", UID, "--root", root,
                         f"dataset.uid_list_file={uid_file}"]
                        + TINY_OVERRIDES)
    assert rc == 0
    objs = [f for f in os.listdir(paths.mesh_dir) if f.endswith(".obj")]
    assert objs

    # ---- stage 3: rig + render passes ----
    from test_fbx_render import make_rig_fbx
    os.makedirs(paths.fbx_dir, exist_ok=True)
    make_rig_fbx(os.path.join(paths.fbx_dir, "rest_pose.fbx"), animate=False)
    from drawingspinup_tpu.cli import run_render
    rc = run_render.main(["--uid", UID, "--data_dir", root])
    assert rc == 0
    assert os.path.exists(paths.frame("rest_pose", "color", 1))
    assert os.path.exists(paths.frame("rest_pose", "edge", 1))

    # ---- stage 3: style training (tiny) + gif ----
    import dataclasses

    from drawingspinup_tpu.pipelines import stage3_translate as st
    from drawingspinup_tpu.train import gan
    tiny = gan.GANConfig(generator="GeneratorJ",
                         filters=(8, 16, 16, 16, 16, 8), resnet_blocks=1,
                         batch_size=4, patch_size=16, input_channels=6,
                         log_interval=10 ** 9)
    st.train_stage(root, UID, 1, cfg=tiny, max_batches=3)
    res = paths.pass_dir("rest_pose", "res_stage1_mask_pos")
    assert os.path.isdir(res) and os.listdir(res)

    from drawingspinup_tpu.cli import gif_writer
    rc = gif_writer.main(["--uid", UID, "--root", root])
    assert rc == 0
    gifs = os.listdir(paths.gif_dir)
    assert gifs, "no GIF produced"
    assert os.path.getsize(os.path.join(paths.gif_dir, gifs[0])) > 0
