"""Stage-2a tests: MV/joint attention semantics, UNet/VAE/CLIP shapes, DDIM
math, weight-port key coverage, and the tiny end-to-end generation flow."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu.models.attention_mv import (
    Attention, BasicMVTransformerBlock, TransformerMV2D,
)
from drawingspinup_tpu.models.clip_vision import (
    CLIPVisionConfig, CLIPVisionModelWithProjection, preprocess,
)
from drawingspinup_tpu.models.unet_mv2d import UNetMV2D, UNetMVConfig
from drawingspinup_tpu.models.vae import AutoencoderKL, VAEConfig
from drawingspinup_tpu.ops import diffusion as D
from drawingspinup_tpu.pipelines import stage2_mv as MV

TINY_UNET = UNetMVConfig(block_out_channels=(32, 64, 64, 64),
                         attention_heads=4, cross_attention_dim=32,
                         num_views=2, mvcd_attention=True)


class TestMVAttention:
    def test_views_fold_creates_cross_view_dependency(self, rng):
        """With MV folding, view 0's output must change when view 1's input
        changes (they share the KV sequence)."""
        attn = Attention(heads=2)
        x = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
        v = attn.init(jax.random.PRNGKey(0), x, kv_fold="views", num_views=2)
        y1 = attn.apply(v, x, kv_fold="views", num_views=2)
        x2 = x.at[1].add(1.0)  # perturb view 1 of batch group 0
        y2 = attn.apply(v, x2, kv_fold="views", num_views=2)
        assert float(jnp.abs(y2[0] - y1[0]).max()) > 1e-6   # cross-view
        assert float(jnp.abs(y2[2] - y1[2]).max()) < 1e-6   # other group

    def test_no_fold_is_independent(self, rng):
        attn = Attention(heads=2)
        x = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
        v = attn.init(jax.random.PRNGKey(0), x)
        y1 = attn.apply(v, x)
        y2 = attn.apply(v, x.at[1].add(1.0))
        assert float(jnp.abs(y2[0] - y1[0]).max()) < 1e-6

    def test_domains_fold(self, rng):
        """Cross-domain: element 0 (domain A) attends to element 2 (domain B
        counterpart)."""
        attn = Attention(heads=2)
        x = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
        v = attn.init(jax.random.PRNGKey(0), x, kv_fold="domains")
        y1 = attn.apply(v, x, kv_fold="domains")
        y2 = attn.apply(v, x.at[2].add(1.0), kv_fold="domains")
        assert float(jnp.abs(y2[0] - y1[0]).max()) > 1e-6

    def test_zero_out_projection(self, rng):
        attn = Attention(heads=2, zero_out=True)
        x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
        v = attn.init(jax.random.PRNGKey(0), x)
        assert float(jnp.abs(attn.apply(v, x)).max()) == 0.0

    def test_transformer_block(self, rng):
        blk = BasicMVTransformerBlock(heads=2, cross_dim=16, num_views=2,
                                      cd_attention_mid=True)
        x = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
        ctx = jnp.asarray(rng.standard_normal((4, 3, 16)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x, ctx)
        y = blk.apply(v, x, ctx)
        assert y.shape == x.shape


class TestUNet:
    def test_forward_shapes(self, rng):
        unet = UNetMV2D(TINY_UNET)
        x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)).astype(np.float32))
        t = jnp.asarray([10, 10, 10, 10])
        ctx = jnp.asarray(rng.standard_normal((4, 1, 32)).astype(np.float32))
        cls = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
        v = unet.init(jax.random.PRNGKey(0), x, t, ctx, cls)
        y = unet.apply(v, x, t, ctx, cls)
        assert y.shape == (4, 16, 16, 4)


class TestVAE:
    def test_roundtrip_shapes(self, rng):
        vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 32, 32, 32)))
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(v, x, method=AutoencoderKL.encode_mode)
        assert z.shape == (1, 4, 4, 4)  # 8× downsample, 4 latents
        img = vae.apply(v, z, method=AutoencoderKL.decode)
        assert img.shape == (1, 32, 32, 3)


class TestCLIP:
    def test_embedding_shape(self, rng):
        cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                               num_layers=2, num_heads=4, projection_dim=16)
        clip = CLIPVisionModelWithProjection(cfg)
        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        v = clip.init(jax.random.PRNGKey(0), x)
        e = clip.apply(v, x)
        assert e.shape == (2, 16)

    def test_preprocess(self, rng):
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        out = preprocess(x, 32)
        assert out.shape == (1, 32, 32, 3)


class TestDDIM:
    def test_one_step_recovers_x0(self, rng):
        """If the model predicts the exact noise, a full-strength DDIM step
        from t to −1 recovers x0 exactly (eta=0)."""
        cfg = D.DDIMConfig(set_alpha_to_one=True)
        acp = jnp.asarray(D.alphas_cumprod(cfg))
        x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
        t = jnp.asarray(500)
        xt = D.add_noise(acp, x0, noise, t)
        prev = D.ddim_step(cfg, acp, noise, t, jnp.asarray(-1), xt, eta=0.0)
        np.testing.assert_allclose(np.asarray(prev), np.asarray(x0),
                                   atol=1e-4)

    def test_timesteps_descending(self):
        cfg = D.DDIMConfig()
        ts = D.timesteps_for(cfg, 75)
        assert len(ts) == 75 and ts[0] > ts[-1] >= 0
        assert ts[0] < cfg.num_train_timesteps


class TestCameraEmbeddings:
    def test_matches_reference_table(self):
        """The computed Δθ/Δazimuth must reproduce the pipeline's built-in
        12-row table (pipeline_mvdiffusion_image.py:136-148)."""
        views = ["front", "front_right", "right", "back", "left",
                 "front_left"]
        emb = MV.camera_task_embeddings(views)
        assert emb.shape == (12, 5)
        expect = np.array([
            [0.0, 0.0, 0.0], [0.0, -0.2362, 0.8125], [0.0, -0.1686, 1.6934],
            [0.0, 0.5220, 3.1406], [0.0, 0.6904, 4.8359],
            [0.0, 0.3733, 5.5859]])
        np.testing.assert_allclose(emb[:6, :3], expect, atol=2e-3)
        np.testing.assert_array_equal(emb[:6, 3:], [[1, 0]] * 6)
        np.testing.assert_array_equal(emb[6:, 3:], [[0, 1]] * 6)
        s = MV.sincos(emb)
        assert s.shape == (12, 10)


class TestPortCoverage:
    def test_unet_mapping_total(self):
        import flax.traverse_util as tu
        from drawingspinup_tpu.utils.diffusers_port import map_unet_key
        unet = UNetMV2D(TINY_UNET)
        v = unet.init(jax.random.PRNGKey(0),
                      jnp.zeros((4, 16, 16, 8)), jnp.zeros((4,), jnp.int32),
                      jnp.zeros((4, 1, 32)), jnp.zeros((4, 10)))
        keys = []
        unmapped = []
        for path in tu.flatten_dict(v["params"]):
            m = map_unet_key(tuple(path))
            if m is None:
                unmapped.append(path)
            else:
                keys.append(m[0])
        assert not unmapped, unmapped[:5]
        assert len(set(keys)) == len(keys)  # no duplicate targets

    def test_vae_clip_mapping_total(self):
        import flax.traverse_util as tu
        from drawingspinup_tpu.utils.diffusers_port import (
            map_clip_key, map_vae_key,
        )
        vae = AutoencoderKL(VAEConfig(block_out_channels=(16, 32, 32, 32)))
        v = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        bad = [p for p in tu.flatten_dict(v["params"])
               if map_vae_key(tuple(p)) is None]
        assert not bad, bad[:5]
        cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                               num_layers=2, num_heads=4, projection_dim=16)
        clip = CLIPVisionModelWithProjection(cfg)
        v = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        bad = [p for p in tu.flatten_dict(v["params"])
               if map_clip_key(tuple(p)) is None]
        assert not bad, bad[:5]


class TestEndToEnd:
    def test_generate_uid_tiny(self, tmp_path):
        from drawingspinup_tpu.core import UidPaths
        from drawingspinup_tpu.core.io import read_image, write_image
        size = 32
        yy, xx = np.mgrid[0:size, 0:size]
        mask = np.hypot(yy - size / 2, xx - size / 2) < size * 0.4
        rgba = np.zeros((size, size, 4), np.float32)
        rgba[mask] = [0.8, 0.5, 0.2, 1.0]
        paths = UidPaths(str(tmp_path), "toy")
        write_image(paths.texture, rgba)
        import os
        os.makedirs(paths.char_dir, exist_ok=True)
        write_image(os.path.join(paths.char_dir,
                                 "ffc_resnet_inpainted.png"), rgba)

        # image_size 64 → latent 8, the smallest that the 4-level UNet
        # down/up pairing supports
        cfg = MV.MVPipelineConfig(
            unet=TINY_UNET,
            num_views=2, image_size=64, num_inference_steps=3, out_size=64)
        pipe = MV.MVPipeline.init_random(cfg, jax.random.PRNGKey(0))
        written = MV.generate_uid(str(tmp_path), "toy", pipe,
                                  views=["front", "back"])
        assert len(written) == 2 * 3  # 2 views × (normal, color, mask)
        m = read_image(paths.mv("mask", "front"))
        assert m.shape[:2] == (64, 64)
        # front mask = the drawing mask (upscaled)
        assert m[..., 0].max() > 0.5

    def test_background_removal(self):
        img = np.ones((32, 32, 3), np.float32)
        img[8:24, 8:24] = [0.2, 0.4, 0.6]
        m = MV.background_removal(img)
        assert m[16, 16] == 1.0 and m[0, 0] == 0.0


def test_mv_tiny_output_stability():
    """Frozen tiny-weights fixture (VERDICT r1 #8): a seeded tiny pipeline's
    sampled outputs must match the checked-in expectation — any structural
    regression in the UNet/attention/DDIM path (e.g. a dropped transformer
    block) shifts these values and fails here, without needing Wonder3D
    weights. Regenerate tests/data/mv_tiny_expected.npz ONLY for an
    intentional, reviewed model change."""
    import os

    import jax
    import numpy as np

    from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
    from drawingspinup_tpu.pipelines import stage2_mv as mv

    cfg = mv.MVPipelineConfig(
        unet=UNetMVConfig(block_out_channels=(32, 64, 64, 64),
                          attention_heads=4, cross_attention_dim=32),
        num_inference_steps=3, image_size=64, out_size=64,
        compute_dtype="float32")
    pipe = mv.MVPipeline.init_random(cfg, jax.random.PRNGKey(5))
    img = np.random.default_rng(6).random((64, 64, 3)).astype(np.float32)
    normals, colors = pipe(img, seed=0)

    exp = np.load(os.path.join(os.path.dirname(__file__), "data",
                               "mv_tiny_expected.npz"))
    np.testing.assert_allclose(normals[:, ::8, ::8], exp["normals"],
                               atol=2e-3)
    np.testing.assert_allclose(colors[:, ::8, ::8], exp["colors"],
                               atol=2e-3)


def test_heuristic_matte_quality_bound():
    """VERDICT r1 weak #5: quantify the heuristic background-distance matte
    (the default side-view mask path when no ISNet checkpoint is present).
    On synthetic white-background composites spanning easy and hard
    (low-contrast, anti-aliased edge) cases it must recover the true alpha
    at IoU ≥ 0.95 — the documented quality floor of the fallback branch."""
    import numpy as np
    from scipy import ndimage

    from drawingspinup_tpu.pipelines.stage2_mv import background_removal

    rng = np.random.default_rng(0)
    size = 128
    yy, xx = np.mgrid[0:size, 0:size]
    ious = []
    for contrast, blur in ((0.8, 0.0), (0.4, 1.0), (0.25, 2.0)):
        alpha = (np.hypot(yy - 64, xx - 60) < 40).astype(np.float32)
        alpha = ndimage.gaussian_filter(alpha, blur) if blur else alpha
        fg = np.ones((size, size, 3), np.float32) * (1.0 - contrast)
        fg += rng.normal(0, 0.02, fg.shape).astype(np.float32)
        img = fg * alpha[..., None] + 1.0 * (1 - alpha[..., None])
        m = background_removal(np.clip(img, 0, 1))
        gt = alpha > 0.5
        pred = m > 0.5
        iou = (gt & pred).sum() / max((gt | pred).sum(), 1)
        ious.append(iou)
    assert min(ious) >= 0.95, ious
