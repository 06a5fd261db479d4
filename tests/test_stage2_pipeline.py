"""End-to-end stage-2b test: synthetic sphere mv/ dataset → recon CLI →
exported OBJ with the reference naming scheme."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from drawingspinup_tpu import native
from drawingspinup_tpu.core import UidPaths
from drawingspinup_tpu.core.io import read_obj, write_image


from drawingspinup_tpu.utils.synthetic import write_sphere_mv  # noqa: E402,F401  (shared fixture, used by fixtures.py/test_e2e re-exports)


TINY_OVERRIDES = [
    "trainer.max_steps=120",
    "system.constant_steps=40",
    "dataset.imSize=[64, 64]",
    "model.train_num_rays_fixed=256",
    "model.geometry.isosurface.resolution=64",
    "model.geometry.face_count=3000",
    "model.geometry.xyz_encoding_config.n_levels=4",
    "model.geometry.xyz_encoding_config.log2_hashmap_size=13",
    "model.geometry.xyz_encoding_config.base_resolution=8",
    "model.geometry.xyz_encoding_config.start_level=4",
    "model.geometry.mlp_network_config.n_neurons=32",
    "model.texture.mlp_network_config.n_neurons=32",
    "export.thinning=false",
]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_recon_end_to_end(tmp_path):
    from drawingspinup_tpu.cli import recon as recon_cli
    from drawingspinup_tpu.core.io import write_image as wi

    paths = write_sphere_mv(tmp_path, "sphere_uid")
    uid_file = tmp_path / "uids.json"
    uid_file.write_text(json.dumps(["sphere_uid"]))

    rc = recon_cli.main([
        "--uid", "sphere_uid", "--root", str(tmp_path),
        f"dataset.uid_list_file={uid_file}",
    ] + TINY_OVERRIDES)
    assert rc == 0

    out = paths.mesh_dir
    objs = [f for f in os.listdir(out) if f.endswith(".obj")]
    assert objs, "no OBJ exported"
    name = objs[0]
    assert name.startswith("it120-mc64-f3000_c_r_s")
    v, f, c = read_obj(os.path.join(out, name))
    assert len(v) > 100 and len(f) > 100
    assert c is not None
    # mesh should approximate the sphere: radius ≈ 0.45·0.5·1.35 after
    # export scaling (×0.5 then ×ortho_scale)
    r = np.linalg.norm(v, axis=1)
    expected = 0.45 * 0.5 * 1.35
    assert abs(np.median(r) - expected) / expected < 0.35, \
        (np.median(r), expected)


def test_sparse_grid_matches_dense():
    """eval_sdf_grid_sparse must reproduce the dense grid's SIGN field (the
    only thing binary marching sees) and be exact inside the surface band.
    Random sphere-init params give a clean SDF ≈ sphere(0.5)."""
    import jax

    from drawingspinup_tpu.pipelines import stage2_recon as s2
    from drawingspinup_tpu.train import nsr
    from test_nsr import TINY_NSR

    state = nsr.init_state(TINY_NSR, jax.random.PRNGKey(3))
    vmin = np.array([-0.8, -0.8, -0.8], np.float32)
    vmax = np.array([0.8, 0.8, 0.8], np.float32)
    R = 64
    dense = s2.eval_sdf_grid(TINY_NSR, state.params, vmin, vmax, R,
                             step=TINY_NSR.max_steps)
    sparse = s2.eval_sdf_grid_sparse(TINY_NSR, state.params, vmin, vmax, R,
                                     step=TINY_NSR.max_steps)
    assert sparse.shape == dense.shape
    # sign parity everywhere
    assert np.array_equal(sparse <= 0, dense <= 0)
    # exact (bf16-rounded) values within the surface band
    cell = float(np.max((vmax - vmin) / (R // 4)))
    near = np.abs(dense) < cell
    assert near.any()
    assert np.abs(sparse[near] - dense[near]).max() < 1e-2
    # extracted meshes coincide
    from drawingspinup_tpu.render.marching import extract_isosurface
    vd, fd = extract_isosurface((dense <= 0).astype(np.float32), sigma=1.0)
    vs, fs = extract_isosurface((sparse <= 0).astype(np.float32), sigma=1.0)
    assert len(vd) == len(vs) and len(fd) == len(fs)
    assert np.abs(vd - vs).max() < 1e-4


@pytest.mark.slow
def test_device_smooth_matches_host_path():
    """Device-smooth export (eval_smoothed_grid_sparse → u8 field) must
    reproduce the host chain (sparse grid → carve → scipy gaussian) up to
    u8 quantization and fp-association: same occupancy away from the 0.5
    crossing, and marched meshes within a fraction of a cell."""
    import jax

    from drawingspinup_tpu.pipelines import stage2_recon as s2
    from drawingspinup_tpu.render.marching import (
        marching_tetrahedra, smooth_binary,
    )
    from drawingspinup_tpu.train import nsr
    from test_nsr import TINY_NSR

    state = nsr.init_state(TINY_NSR, jax.random.PRNGKey(3))
    vmin = np.array([-0.8, -0.8, -0.8], np.float32)
    vmax = np.array([0.8, 0.8, 0.8], np.float32)
    R = 256
    # synthetic carve mask: drop one corner quadrant
    front = np.ones((64, 64), np.float32)
    front[:20, :20] = 0.0

    level = s2.eval_sdf_grid_sparse(TINY_NSR, state.params, vmin, vmax, R,
                                    step=TINY_NSR.max_steps)
    crop = s2.front_crop(front, vmin, vmax, R)
    binary = (level <= 0) & (crop[:, None, :] > 127)
    host_sm = smooth_binary(binary.astype(np.float32), 1.0)

    dev_u8 = s2.eval_smoothed_grid_sparse(TINY_NSR, state.params, vmin,
                                          vmax, R, step=TINY_NSR.max_steps,
                                          front_mask=front)
    assert dev_u8.dtype == np.uint8 and dev_u8.shape == (R, R, R)
    dev_sm = dev_u8.astype(np.float32) / 255.0

    # occupancy agreement away from the crossing. The two paths each
    # re-evaluate the field; voxels with |sdf| ≈ fp-noise can flip between
    # runs and each flip perturbs its 9³ smoothing neighborhood — so the
    # bounds tolerate ISOLATED eval-noise (≤1e-4 of voxels) while a
    # systematic smoothing difference (wrong kernel/boundary) would move
    # orders of magnitude more
    confident = np.abs(host_sm - 0.5) > 0.02
    mismatch = ((host_sm > 0.5) != (dev_sm > 0.5)) & confident
    assert mismatch.mean() < 1e-4, mismatch.mean()
    diff = np.abs(host_sm - dev_sm)
    assert (diff > 0.02).mean() < 1e-4, (diff > 0.02).mean()
    assert float(np.quantile(diff, 0.999)) < 0.01

    vh, fh = marching_tetrahedra(host_sm, 0.5)
    vd2, fd2 = marching_tetrahedra(dev_sm, 0.5)
    assert abs(len(fh) - len(fd2)) <= 0.01 * max(len(fh), 1)
    # vertex agreement: 99.9% within a third of a cell; isolated
    # eval-noise flips may move a handful up to ~a kernel radius
    from scipy.spatial import cKDTree
    d1 = cKDTree(vh).query(vd2, k=1)[0]
    d2 = cKDTree(vd2).query(vh, k=1)[0]
    assert float(np.quantile(np.concatenate([d1, d2]), 0.999)) < 0.34
    assert max(d1.max(), d2.max()) < 8.0

    # end-to-end device-march half: same mesh in world coords with the
    # SAME orientation (signed volume agrees — the (z,y,x) unpermute must
    # flip face winding)
    wv_h, wf_h = s2.isosurface_from_level(level, vmin, vmax, R,
                                          front_mask=front, remeshing=False)
    wv_d, wf_d = s2.isosurface_from_smoothed(dev_u8, vmin, vmax, R,
                                             remeshing=False)

    def signed_volume(v, f):
        t = v[f]
        return float(np.einsum("ij,ij->i", t[:, 0],
                               np.cross(t[:, 1], t[:, 2])).sum() / 6.0)

    sv_h, sv_d = signed_volume(wv_h, wf_h), signed_volume(wv_d, wf_d)
    assert sv_h * sv_d > 0, (sv_h, sv_d)
    assert abs(sv_d - sv_h) < 0.05 * abs(sv_h), (sv_h, sv_d)


def test_sparse_grid_odd_resolution_falls_back_cleanly():
    """ADVICE r1: every resolution must get bounded-size slab programs —
    np.array_split path, exercised at a non-multiple-of-8 resolution."""
    import jax

    from drawingspinup_tpu.pipelines import stage2_recon as s2
    from drawingspinup_tpu.train import nsr
    from test_nsr import TINY_NSR

    state = nsr.init_state(TINY_NSR, jax.random.PRNGKey(3))
    vmin = np.array([-0.7] * 3, np.float32)
    vmax = np.array([0.7] * 3, np.float32)
    g = s2.eval_sdf_grid(TINY_NSR, state.params, vmin, vmax, 27,
                         step=TINY_NSR.max_steps)
    assert g.shape == (27, 27, 27)
    assert np.isfinite(g).all()


def test_prewarm_smoke():
    """stage2_recon.prewarm compiles/dispatches every canonical program
    (hull march, per-phase train steps incl. the dp path on the 8-device
    mesh, export grid) without error, and is once-per-process."""
    from drawingspinup_tpu.pipelines import stage2_recon
    from test_nsr import TINY_NSR
    import dataclasses

    cfg = dataclasses.replace(TINY_NSR, hull_trange=True)
    dt = stage2_recon.prewarm(cfg, im_size=32, mc_resolution=32)
    assert dt > 0.0
    assert stage2_recon.prewarm(cfg, im_size=32, mc_resolution=32) == 0.0


def test_recon_resume_from_params_checkpoint(tmp_path, capsys):
    """A finished-training uid re-exports from the params-only checkpoint
    without retraining (the only save happens at max_steps, so resume ≡
    're-export'); the restored run must print the resume line and produce
    an OBJ again after the first one is deleted."""
    from drawingspinup_tpu.cli import recon as recon_cli
    from drawingspinup_tpu.core import UidPaths

    root = str(tmp_path)
    write_sphere_mv(root, "resume_uid")
    uid_file = tmp_path / "uids.txt"
    uid_file.write_text("resume_uid")
    args = ["--uid", "resume_uid", "--root", root,
            f"dataset.uid_list_file={uid_file}"] + TINY_OVERRIDES
    assert recon_cli.main(args) == 0
    paths = UidPaths(root, "resume_uid")
    objs = [f for f in os.listdir(paths.mesh_dir) if f.endswith(".obj")]
    assert objs
    os.remove(os.path.join(paths.mesh_dir, objs[0]))
    capsys.readouterr()
    assert recon_cli.main(args) == 0
    out = capsys.readouterr().out
    assert "resumed from step" in out
    assert any(f.endswith(".obj") for f in os.listdir(paths.mesh_dir))
