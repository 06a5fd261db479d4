"""Tests for the breadth components: pix2pixhd zoo, registries, stage-1
training path, bicar renderer, encodings, sweep, metrics."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu import native
from drawingspinup_tpu.core.io import write_obj


class TestPix2PixHD:
    def test_global_generator(self, rng):
        from drawingspinup_tpu.models.pix2pixhd import GlobalGenerator
        g = GlobalGenerator(output_nc=1, ngf=8, n_downsampling=2, n_blocks=2,
                            out_act="sigmoid")
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        v = g.init(jax.random.PRNGKey(0), x)
        y = g.apply(v, x)
        assert y.shape == (1, 32, 32, 1)
        assert 0 <= float(y.min()) and float(y.max()) <= 1

    def test_multidilated_generator(self, rng):
        from drawingspinup_tpu.models.pix2pixhd import MultiDilatedGlobalGenerator
        g = MultiDilatedGlobalGenerator(output_nc=3, ngf=6, n_downsampling=2,
                                        n_blocks=1)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        y = g.apply(g.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (1, 32, 32, 3)

    def test_superchannels_generator(self, rng):
        from drawingspinup_tpu.models.pix2pixhd import GlobalGeneratorFromSuperChannels
        g = GlobalGeneratorFromSuperChannels(
            output_nc=3, super_channels=(8, 16, 32, 64, 64, 64, 128, 64, 96),
            n_downsampling=3, n_blocks=6)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        y = g.apply(g.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (1, 16, 16, 3)

    def test_config_generator_schedule(self, rng):
        """ConfigGlobalGenerator parses a per-instance manual_block_spec
        (reference pix2pixhd.py:239-326): mixed block kinds, per-run conv
        kind and dilation, default fallback."""
        from drawingspinup_tpu.models.pix2pixhd import ConfigGlobalGenerator
        spec = (
            {"n_blocks": 1, "resnet_block_kind": "multidilatedresnetblock"},
            {"n_blocks": 1, "resnet_block_kind": "resnetblock",
             "resnet_conv_kind": "default"},
            {"n_blocks": 1, "resnet_block_kind": "resnetblock5x5",
             "resnet_conv_kind": "default"},
            {"n_blocks": 1, "resnet_block_kind": "resnetblockdwdil",
             "resnet_conv_kind": "default", "resnet_dilation": 2},
        )
        g = ConfigGlobalGenerator(output_nc=3, ngf=8, n_downsampling=2,
                                  manual_block_spec=spec)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v = g.init(jax.random.PRNGKey(0), x)
        y = g.apply(v, x)
        assert y.shape == (1, 32, 32, 3)
        p = v["params"]
        # block 0 multidilated: branch kernels; block 1 plain 3×3;
        # block 2 5×5; block 3 dilated (raw dilated kernel params)
        assert "kernel0" in p["block0"]["conv1"]
        assert p["block1"]["conv1"]["kernel"].shape[0] == 3
        assert p["block2"]["conv1"]["kernel"].shape[0] == 5
        assert "conv1_kernel" in p["block3"]

        # empty spec → n_blocks of the instance defaults
        g2 = ConfigGlobalGenerator(output_nc=3, ngf=8, n_downsampling=2,
                                   n_blocks=2)
        v2 = g2.init(jax.random.PRNGKey(0), x)
        assert "block1" in v2["params"] and "block2" not in v2["params"]

    def test_nlayer_discriminators(self, rng):
        from drawingspinup_tpu.models.pix2pixhd import (
            MultidilatedNLayerDiscriminator, NLayerDiscriminator,
        )
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        for cls in (NLayerDiscriminator, MultidilatedNLayerDiscriminator):
            d = cls(ndf=8, n_layers=2)
            score, feats = d.apply(d.init(jax.random.PRNGKey(0), x), x)
            assert score.shape[-1] == 1 and len(feats) == 3

    def test_rotate_roundtrip(self, rng):
        from drawingspinup_tpu.models.pix2pixhd import rotate_image
        x = jnp.asarray(rng.random((1, 17, 17, 2)).astype(np.float32))
        y = rotate_image(rotate_image(x, jnp.asarray(37.0)),
                         jnp.asarray(-37.0))
        # interior survives the round trip (borders zero-fill)
        err = np.abs(np.asarray(y - x))[0, 5:12, 5:12]
        assert err.mean() < 0.2  # bilinear resampling ×2 loses precision

    def test_registry(self):
        from drawingspinup_tpu.models import make_discriminator, make_generator
        g = make_generator("pix2pixhd_global", ngf=8, n_downsampling=2,
                           n_blocks=1)
        d = make_discriminator("pix2pixhd_nlayer", ndf=8)
        assert g is not None and d is not None
        with pytest.raises(KeyError):
            make_generator("nope")


class TestStage1Training:
    def _dataset(self, tmp_path, n_uids=3):
        from drawingspinup_tpu.core.io import write_image
        from drawingspinup_tpu.pipelines.stage1_data import contour_band
        uids = [f"u{i}" for i in range(n_uids)]
        size = 64
        yy, xx = np.mgrid[0:size, 0:size]
        mask = (np.hypot(yy - 32, xx - 32) < 24).astype(np.float32)
        rgba = np.zeros((size, size, 4), np.float32)
        rgba[..., 0] = 0.6 * mask
        rgba[..., 3] = mask
        for uid in uids:
            write_image(str(tmp_path / uid / "rgba.png"), rgba)
            for k in range(6):
                write_image(str(tmp_path / uid / f"contour_{k}.png"),
                            contour_band(mask, k % 3 + 1))
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(uids))
        return str(tmp_path), str(uid_file)

    def test_synthesis_and_dataset(self, tmp_path):
        import drawingspinup_tpu.pipelines.stage1_data as sd
        root, uid_json = self._dataset(tmp_path)
        ds = sd.BiCarDataset(root, uid_json, "train")
        # with <1200 uids everything is in train split? No: [:1200] keeps all
        batch = next(ds.batches(2))
        assert batch["input"].shape == (2, 512, 512, 4)
        assert batch["gt"].shape[0] == 2
        assert set(np.unique(batch["gt"])) <= {0.0, 1.0}

    def test_train_step_decreases(self, tmp_path):
        import drawingspinup_tpu.pipelines.stage1_data as sd
        from drawingspinup_tpu.train import lama
        root, uid_json = self._dataset(tmp_path)
        cfg = lama.LamaTrainConfig(ngf=8, n_downsampling=2, n_blocks=1,
                                   batch_size=2)
        state = lama.init_state(cfg, jax.random.PRNGKey(0), size=64)
        ds = sd.BiCarDataset(root, uid_json, "train")
        key = jax.random.PRNGKey(1)
        first = None
        for step, batch in enumerate(ds.batches(2)):
            if step >= 12:
                break
            # shrink to 64² for speed
            b = {"input": jnp.asarray(batch["input"][:, ::8, ::8]),
                 "gt": jnp.asarray(batch["gt"][:, ::8, ::8, 0])}
            key, k = jax.random.split(key)
            state, logs = lama.train_step(cfg, state, b, k)
            if step == 0:
                first = float(logs["bce"])
        assert float(logs["bce"]) < first


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestBicarRenderer:
    def test_render_object(self, tmp_path):
        from drawingspinup_tpu.render.bicar import batch_render, render_object
        # simple box mesh
        v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
        obj_root = tmp_path / "objs"
        write_obj(str(obj_root / "uid1" / "model.obj"), v, f,
                  vertex_colors=np.full_like(v, 0.5))
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["uid1", "missing_uid"]))
        out_root = tmp_path / "out"
        done = batch_render(str(obj_root), str(out_root), str(uid_file),
                            randomize_pose=True)
        assert done == ["uid1"]  # missing uid skipped, farm continued
        from drawingspinup_tpu.core.io import read_image
        rgba = read_image(str(out_root / "uid1" / "rgba.png"))
        assert rgba.shape == (512, 512, 4)
        assert rgba[..., 3].mean() > 0.1
        c = read_image(str(out_root / "uid1" / "contour_0.png"))
        assert c.max() > 0.5


class TestEncodings:
    def test_frequency_encoding(self, rng):
        from drawingspinup_tpu.models.encodings import (
            frequency_mask, vanilla_frequency,
        )
        x = jnp.asarray(rng.random((4, 3)).astype(np.float32))
        out = vanilla_frequency(x, 4)
        assert out.shape == (4, 24)
        m = frequency_mask(4, jnp.asarray(50), 100)
        assert m.shape == (4,) and float(m[0]) == 1.0 and float(m[-1]) == 0.0

    def test_sh_basis_constant(self):
        from drawingspinup_tpu.models.encodings import spherical_harmonics_l4
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        sh = spherical_harmonics_l4(d)
        assert sh.shape == (1, 16)
        assert float(sh[0, 0]) == pytest.approx(0.2820947, abs=1e-6)

    def test_trunc_exp_grad_clamped(self):
        from drawingspinup_tpu.models.encodings import trunc_exp
        g = jax.grad(lambda x: trunc_exp(x))(jnp.asarray(100.0))
        assert np.isfinite(float(g))

    def test_chunk_batch(self, rng):
        from drawingspinup_tpu.models.encodings import chunk_batch
        x = jnp.asarray(rng.random((37, 3)).astype(np.float32))
        out = chunk_batch(lambda a: a * 2, 8, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


class TestSweep:
    def test_continue_on_error_and_resume(self, tmp_path):
        from drawingspinup_tpu.pipelines.sweep import run_sweep
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["a", "b", "c"]))
        calls = []

        def good(uid):
            calls.append(uid)

        def flaky(uid):
            if uid == "b":
                raise RuntimeError("boom")

        res = run_sweep(str(tmp_path), str(uid_file),
                        {"s1": good, "s2": flaky},
                        log_path=str(tmp_path / "log.jsonl"))
        assert res["ok"] == ["a", "c"] and res["failed"] == ["b"]
        lines = [json.loads(l) for l in
                 open(tmp_path / "log.jsonl").read().splitlines()]
        assert any(r.get("stage") == "FAILED" for r in lines)

    def test_stage_major_order(self, tmp_path):
        """Default order runs every uid through a stage before the next
        stage (keeps each stage's device programs resident); a uid that
        fails a stage skips its later stages."""
        from drawingspinup_tpu.pipelines.sweep import run_sweep
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["a", "b"]))
        calls = []

        def s1(uid):
            calls.append(("s1", uid))
            if uid == "a":
                raise RuntimeError("boom")

        def s2(uid):
            calls.append(("s2", uid))

        res = run_sweep(str(tmp_path), str(uid_file), {"s1": s1, "s2": s2},
                        log_path=str(tmp_path / "log.jsonl"))
        assert calls == [("s1", "a"), ("s1", "b"), ("s2", "b")]
        assert res["ok"] == ["b"] and res["failed"] == ["a"]

    def test_transient_device_error_retried_once(self, tmp_path,
                                                 monkeypatch):
        """A stage raising an UNAVAILABLE-class error is retried once (the
        remote TPU worker can crash/restart); persistent errors still fail
        the uid."""
        import drawingspinup_tpu.pipelines.sweep as sweep_mod
        monkeypatch.setattr(sweep_mod.time, "sleep", lambda s: None)
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["a"]))
        attempts = []

        from jax.errors import JaxRuntimeError

        def flaky(uid):
            attempts.append(uid)
            if len(attempts) == 1:
                raise JaxRuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted.")

        res = sweep_mod.run_sweep(str(tmp_path), str(uid_file),
                                  {"s": flaky},
                                  log_path=str(tmp_path / "log.jsonl"))
        assert res["ok"] == ["a"] and len(attempts) == 2

        attempts.clear()

        def always_down(uid):
            attempts.append(uid)
            raise JaxRuntimeError("UNAVAILABLE: still down")

        res = sweep_mod.run_sweep(str(tmp_path), str(uid_file),
                                  {"s": always_down}, resume=False,
                                  log_path=str(tmp_path / "log2.jsonl"))
        assert res["failed"] == ["a"] and len(attempts) == 2

    def test_application_error_mentioning_unavailable_not_retried(
            self, tmp_path, monkeypatch):
        """ADVICE r1: a non-runtime application error whose MESSAGE merely
        contains 'UNAVAILABLE' must not trigger the device-loss retry."""
        import drawingspinup_tpu.pipelines.sweep as sweep_mod
        monkeypatch.setattr(sweep_mod.time, "sleep", lambda s: None)
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["a"]))
        attempts = []

        def app_error(uid):
            attempts.append(uid)
            raise ValueError("config key UNAVAILABLE in mapping")

        res = sweep_mod.run_sweep(str(tmp_path), str(uid_file),
                                  {"s": app_error}, resume=False,
                                  log_path=str(tmp_path / "log3.jsonl"))
        assert res["failed"] == ["a"] and len(attempts) == 1

    def test_sharding(self, tmp_path):
        from drawingspinup_tpu.pipelines.sweep import run_sweep
        uid_file = tmp_path / "uids.json"
        uid_file.write_text(json.dumps(["a", "b", "c", "d"]))
        seen = []
        run_sweep(str(tmp_path), str(uid_file),
                  {"s": lambda u: seen.append(u)}, shard_index=1,
                  num_shards=2, log_path=str(tmp_path / "l.jsonl"))
        assert seen == ["b", "d"]


class TestMetrics:
    def test_jsonl(self, tmp_path):
        from drawingspinup_tpu.core.metrics import MetricsLogger
        p = tmp_path / "m.jsonl"
        log = MetricsLogger(str(p))
        log.log(step=1, loss=jnp.asarray(0.5))
        rec = json.loads(p.read_text().splitlines()[0])
        assert rec["step"] == 1 and abs(rec["loss"] - 0.5) < 1e-6


class TestQualityMetrics:
    def test_psnr_ssim_identity(self, rng):
        from drawingspinup_tpu.utils.quality import psnr, ssim
        a = rng.random((32, 32, 3)).astype(np.float32)
        assert psnr(a, a) == float("inf")
        assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
        noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
        assert 10 < psnr(a, noisy) < 30
        assert ssim(a, noisy) < 0.99

    def test_perceptual_distance(self, rng):
        from drawingspinup_tpu.utils.quality import perceptual_distance
        a = rng.random((32, 32, 3)).astype(np.float32)
        assert perceptual_distance(a, a) == 0.0
        b = np.clip(a + 0.3, 0, 1)
        assert perceptual_distance(a, b) > 0

    def test_compare_dirs(self, tmp_path, rng):
        from drawingspinup_tpu.core.io import write_image
        from drawingspinup_tpu.utils.quality import compare_stage_outputs
        a = rng.random((16, 16, 3)).astype(np.float32)
        for d in ("a", "b"):
            os.makedirs(tmp_path / d)
        write_image(str(tmp_path / "a" / "x.png"), a)
        write_image(str(tmp_path / "b" / "x.png"), a)
        write_image(str(tmp_path / "a" / "only_a.png"), a)
        out = compare_stage_outputs(str(tmp_path / "a"), str(tmp_path / "b"))
        assert out["x.png"]["psnr"] > 40
        assert out["only_a.png"]["missing"]


class TestMeshGifMetrics:
    """Full-contract fidelity (VERDICT r2 next #8): mesh chamfer/color and
    GIF frame comparison."""

    def _sphere(self, r, n=24, color=(0.5, 0.5, 0.5)):
        th = np.linspace(0.1, np.pi - 0.1, n)
        ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
        tt, pp = np.meshgrid(th, ph, indexing="ij")
        v = np.stack([r * np.sin(tt) * np.cos(pp),
                      r * np.sin(tt) * np.sin(pp),
                      r * np.cos(tt)], -1).reshape(-1, 3).astype(np.float32)
        faces = []
        for i in range(n - 1):
            for j in range(n):
                a, b = i * n + j, i * n + (j + 1) % n
                c, d = a + n, b + n
                faces.append([a, b, c])
                faces.append([b, d, c])
        c = np.broadcast_to(np.asarray(color, np.float32), v.shape).copy()
        return v, np.asarray(faces, np.int64), c

    def test_chamfer_scales_with_radius(self):
        from drawingspinup_tpu.utils.quality import chamfer_distance
        va, _, _ = self._sphere(0.4)
        vb, _, _ = self._sphere(0.4)
        vc, _, _ = self._sphere(0.3)
        assert chamfer_distance(va, vb) < 1e-6
        d = chamfer_distance(va, vc)
        assert 0.08 < d < 0.12     # radii differ by 0.1

    def test_compare_mesh(self, tmp_path):
        from drawingspinup_tpu.core.io import write_obj
        from drawingspinup_tpu.utils.quality import compare_mesh
        va, fa, ca = self._sphere(0.4, color=(0.8, 0.2, 0.1))
        vb, fb, cb = self._sphere(0.4, color=(0.8, 0.2, 0.3))
        pa, pb = str(tmp_path / "a.obj"), str(tmp_path / "b.obj")
        write_obj(pa, va, fa, vertex_colors=ca)
        write_obj(pb, vb, fb, vertex_colors=cb)
        r = compare_mesh(pa, pb)
        assert r["chamfer"] < 1e-4
        assert r["color_mse"] == pytest.approx(0.04 / 3, rel=0.1)
        assert r["n_verts"][0] == len(va)

    def test_compare_gif(self, tmp_path):
        from drawingspinup_tpu.core.io import write_gif
        from drawingspinup_tpu.utils.quality import compare_gif
        rng = np.random.default_rng(0)
        frames = [rng.random((16, 16, 3)).astype(np.float32)
                  for _ in range(3)]
        shifted = [np.clip(f + 0.1, 0, 1) for f in frames]
        pa, pb = str(tmp_path / "a.gif"), str(tmp_path / "b.gif")
        write_gif(pa, frames)
        write_gif(pb, shifted)
        same = compare_gif(pa, pa)
        assert same["n_frames"] == (3, 3)
        assert same["aggregate"]["psnr"] == float("inf")
        diff = compare_gif(pa, pb)
        assert diff["aggregate"]["psnr"] < same["aggregate"]["psnr"]
        assert len(diff["frames"]) == 3


class TestFreestyleContour:
    def test_properties(self):
        """freestyle_contour: soft alpha in [0,1], confined to the mask's
        inside rim, wider thickness → more covered pixels, gaps possible."""
        from drawingspinup_tpu.pipelines.stage1_data import (
            contour_band, freestyle_contour)
        size = 96
        yy, xx = np.mgrid[0:size, 0:size]
        mask = (np.hypot(yy - 48, xx - 48) < 36).astype(np.float32)
        rng = np.random.default_rng(0)
        thin = freestyle_contour(mask, 2, rng)
        thick = freestyle_contour(mask, 10, rng)
        for band in (thin, thick):
            assert band.dtype == np.float32
            assert 0.0 <= band.min() and band.max() <= 1.0
            assert (band[mask == 0] == 0).all()      # INSIDE the silhouette
        assert (thick > 0).sum() > (thin > 0).sum() * 2
        # soft alpha: fractional values exist (not a hard band)
        assert ((thick > 0) & (thick < 1)).any()
        # hard band stays available
        hb = contour_band(mask, 3)
        assert set(np.unique(hb)) <= {0.0, 1.0}

    def test_variants_differ(self):
        from drawingspinup_tpu.pipelines.stage1_data import freestyle_contour
        size = 64
        yy, xx = np.mgrid[0:size, 0:size]
        mask = (np.hypot(yy - 32, xx - 32) < 24).astype(np.float32)
        rng = np.random.default_rng(1)
        a = freestyle_contour(mask, 5, rng)
        b = freestyle_contour(mask, 5, rng)
        assert np.abs(a - b).max() > 0.1   # stochastic wobble/gaps


def test_fidelity_cli(tmp_path):
    """cli/fidelity compares two per-uid trees stage by stage (the LPIPS
    parity bar becomes one command once reference outputs exist)."""
    import numpy as np

    from drawingspinup_tpu.cli import fidelity
    from drawingspinup_tpu.core import UidPaths
    from drawingspinup_tpu.core.io import write_image

    from drawingspinup_tpu.core.io import write_gif, write_obj

    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    verts = rng.random((30, 3)).astype(np.float32)
    faces = np.stack([np.arange(0, 10), np.arange(10, 20),
                      np.arange(20, 30)], 1).astype(np.int64)
    frames = [rng.random((8, 8, 3)).astype(np.float32) for _ in range(2)]
    for side in ("ours", "theirs"):
        p = UidPaths(str(tmp_path / side), "u1")
        write_image(os.path.join(p.char_dir, "ffc_resnet_inpainted.png"), img)
        write_image(os.path.join(p.mv_dir, "color", "front.png"),
                    img if side == "ours"
                    else np.clip(img + 0.1, 0, 1))
        os.makedirs(p.mesh_dir, exist_ok=True)
        write_obj(os.path.join(p.mesh_dir, "u1.obj"), verts, faces,
                  vertex_colors=np.full_like(verts, 0.5))
        os.makedirs(p.gif_dir, exist_ok=True)
        write_gif(os.path.join(p.gif_dir, "walk.gif"), frames)
    out = tmp_path / "report.json"
    rc = fidelity.main(["--ours", str(tmp_path / "ours"),
                        "--theirs", str(tmp_path / "theirs"),
                        "--uid", "u1", "--out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["stage1_char"]["aggregate"]["psnr"] == "inf"  # identical
    assert report["stage2a_mv_color"]["aggregate"]["psnr"] < 30
    # full-contract coverage: mesh + gif sections present and exact-match
    mesh = report["stage2b_mesh"]["files"]["u1.obj"]
    assert mesh["chamfer"] < 1e-6 and mesh["color_mse"] == 0.0
    gif = report["gif"]["files"]["walk.gif"]
    assert gif["n_frames"] == [2, 2]
    # exact match serializes as the string "inf" (bare Infinity is not RFC
    # JSON); the report must parse under a strict parser
    assert gif["aggregate"]["psnr"] == "inf"
    json.loads(out.read_text(), parse_constant=lambda s: pytest.fail(
        f"non-RFC JSON constant {s} in fidelity report"))
