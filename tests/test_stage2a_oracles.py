"""Executed forward-parity oracles for stage 2a (VERDICT r3 item #1).

Until this round, the MV UNet / VAE / CLIP / DDIM numerics were proven only
by attention-processor oracles + checkpoint-schema round-trips. Here the
reference's OWN torch modules (mvdiffusion/models/*, 2,400 LoC, imported
verbatim under tests/diffusers_double.py's faithful diffusers-0.19.3 subset)
are random-initialized, their state_dicts ported through
utils/diffusers_port.py, and the flax rebuilds must reproduce their forward
outputs:

  * UNetMV2DConditionModel (reference unet_mv2d_condition.py:760-1054 +
    unet_mv2d_blocks.py + transformer_mv2d.py) → models/unet_mv2d.py,
    across the joint-attention knob grid (cd mid / last / sparse MV).
  * AutoencoderKL encode-mode/decode (the exact calls the reference pipeline
    makes, pipeline_mvdiffusion_image.py:174,492) → models/vae.py, against
    the stock-SD-VAE double.
  * CLIPVisionModelWithProjection — the REAL transformers torch model (the
    package is installed) → models/clip_vision.py.
  * DDIMScheduler set_timesteps/step (0.19.3 semantics: leading spacing,
    steps_offset, eta variance, epsilon/v prediction, final-step
    prev_timestep < 0) → ops/diffusion.py.

All comparisons run in float32 on CPU; tolerances are a few ulp-amplified
1e-5s, NOT 1e-3 — a wrong exponent or a swapped norm cannot hide.
"""

from __future__ import annotations

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import numpy as np
import pytest
import torch

from tests.diffusers_double import (
    AutoencoderKLDouble, DDIMSchedulerDouble, import_reference_mvdiffusion,
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def state_numpy(module: torch.nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def overlay_strict(params, state, mapper):
    """Port a torch state_dict onto a flax tree; every flax leaf must match."""
    import flax.traverse_util as tu

    from drawingspinup_tpu.utils.diffusers_port import overlay

    ported, hit, miss = overlay(params, state, mapper)
    n = len(tu.flatten_dict(params))
    assert miss == 0 and hit == n, (hit, miss, n)
    return ported


# ---------------------------------------------------------------------------
# UNetMV2D — the big one
# ---------------------------------------------------------------------------

TINY = dict(block_out_channels=(32, 64), layers_per_block=2,
            cross_attention_dim=16, attention_heads=4,
            projection_class_embeddings_input_dim=10, num_views=2)


def _ref_unet_kwargs(flax_cfg):
    n = len(flax_cfg.block_out_channels)
    return dict(
        sample_size=8,
        in_channels=flax_cfg.in_channels,
        out_channels=flax_cfg.out_channels,
        down_block_types=("CrossAttnDownBlockMV2D",) * (n - 1)
        + ("DownBlock2D",),
        mid_block_type="UNetMidBlockMV2DCrossAttn",
        up_block_types=("UpBlock2D",) + ("CrossAttnUpBlockMV2D",) * (n - 1),
        block_out_channels=flax_cfg.block_out_channels,
        layers_per_block=flax_cfg.layers_per_block,
        cross_attention_dim=flax_cfg.cross_attention_dim,
        attention_head_dim=flax_cfg.attention_heads,  # diffusers naming quirk:
        # attention_head_dim IS the head count (unet_mv2d_condition.py:245-251)
        class_embed_type="projection",
        projection_class_embeddings_input_dim=(
            flax_cfg.projection_class_embeddings_input_dim),
        num_views=flax_cfg.num_views,
        cd_attention_mid=flax_cfg.cd_attention_mid,
        cd_attention_last=flax_cfg.cd_attention_last,
        sparse_mv_attention=flax_cfg.sparse_mv_attention,
        mvcd_attention=flax_cfg.mvcd_attention,
    )


def _run_unet_parity(flax_cfg, seed=0):
    from drawingspinup_tpu.models.unet_mv2d import UNetMV2D
    from drawingspinup_tpu.utils.diffusers_port import map_unet_key

    ref_mod = import_reference_mvdiffusion()
    torch.manual_seed(seed)
    ref = ref_mod.UNetMV2DConditionModel(**_ref_unet_kwargs(flax_cfg))
    ref.eval()
    # the fork's plain processors don't accept the sparse/mvcd kwargs its
    # blocks always pass — the reference only runs with xformers processors
    # (mv.py:39); the double's memory_efficient_attention is exact softmax
    ref.enable_xformers_memory_efficient_attention()

    b = flax_cfg.num_views * 2      # two domains (normals, colors)
    hw, s = 8, 3
    rng = np.random.RandomState(seed)
    sample = rng.randn(b, hw, hw, flax_cfg.in_channels).astype(np.float32)
    ehs = rng.randn(b, s, flax_cfg.cross_attention_dim).astype(np.float32)
    cls = rng.randn(b, flax_cfg.projection_class_embeddings_input_dim
                    ).astype(np.float32)
    t = 417

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(sample).permute(0, 3, 1, 2),
                      torch.tensor(t),
                      encoder_hidden_states=torch.from_numpy(ehs),
                      class_labels=torch.from_numpy(cls),
                      return_dict=False)[0].permute(0, 2, 3, 1).numpy()

    unet = UNetMV2D(flax_cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.asarray(sample),
                       jnp.asarray(t, jnp.int32), jnp.asarray(ehs),
                       jnp.asarray(cls))["params"]
    params = overlay_strict(params, state_numpy(ref), map_unet_key)
    out = np.asarray(unet.apply({"params": params}, jnp.asarray(sample),
                                jnp.asarray(t, jnp.int32), jnp.asarray(ehs),
                                jnp.asarray(cls)))
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max()
    scale = np.abs(ref_out).max()
    assert err <= 2e-4 * max(scale, 1.0), (err, scale)
    return err


class TestUNetMV2DForwardOracle:
    """Full-model executed parity across the attention-knob grid."""

    def test_joint_mid(self):
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        _run_unet_parity(UNetMVConfig(cd_attention_mid=True,
                                      cd_attention_last=False, **TINY))

    def test_joint_last(self):
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        _run_unet_parity(UNetMVConfig(cd_attention_mid=False,
                                      cd_attention_last=True, **TINY))

    def test_no_joint_sparse_mv(self):
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        _run_unet_parity(UNetMVConfig(cd_attention_mid=False,
                                      cd_attention_last=False,
                                      sparse_mv_attention=True, **TINY))

    def test_three_levels_six_views(self):
        """Deeper pyramid + the production view count at small channels."""
        from drawingspinup_tpu.models.unet_mv2d import UNetMVConfig
        _run_unet_parity(UNetMVConfig(
            block_out_channels=(32, 32, 64), layers_per_block=1,
            cross_attention_dim=16, attention_heads=2,
            projection_class_embeddings_input_dim=10, num_views=6,
            cd_attention_mid=True))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

class TestVAEOracle:
    def _build(self, seed=0):
        from drawingspinup_tpu.models.vae import AutoencoderKL, VAEConfig
        from drawingspinup_tpu.utils.diffusers_port import map_vae_key

        cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=2)
        torch.manual_seed(seed)
        ref = AutoencoderKLDouble(block_out_channels=(32, 64),
                                  layers_per_block=2)
        ref.eval()
        vae = AutoencoderKL(cfg)
        x = np.random.RandomState(seed).randn(2, 16, 16, 3).astype(np.float32)
        params = vae.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = overlay_strict(params, state_numpy(ref), map_vae_key)
        return ref, vae, params, x

    def test_encode_mode(self):
        from drawingspinup_tpu.models.vae import AutoencoderKL
        ref, vae, params, x = self._build()
        with torch.no_grad():
            ref_z = ref.encode_mode(torch.from_numpy(x).permute(0, 3, 1, 2))
        z = np.asarray(vae.apply({"params": params}, jnp.asarray(x),
                                 method=AutoencoderKL.encode_mode))
        ref_z = ref_z.permute(0, 2, 3, 1).numpy()
        assert z.shape == ref_z.shape
        assert np.abs(z - ref_z).max() <= 1e-5 * max(np.abs(ref_z).max(), 1.0)

    def test_decode(self):
        from drawingspinup_tpu.models.vae import AutoencoderKL
        ref, vae, params, _ = self._build(seed=1)
        z = np.random.RandomState(2).randn(2, 4, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref_img = ref.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
        img = np.asarray(vae.apply({"params": params}, jnp.asarray(z),
                                   method=AutoencoderKL.decode))
        ref_img = ref_img.permute(0, 2, 3, 1).numpy()
        assert np.abs(img - ref_img).max() <= 2e-5 * max(
            np.abs(ref_img).max(), 1.0)


# ---------------------------------------------------------------------------
# CLIP vision — REAL transformers torch model as the oracle
# ---------------------------------------------------------------------------

class TestCLIPVisionOracle:
    def test_forward_parity(self):
        transformers = pytest.importorskip("transformers")
        from drawingspinup_tpu.models.clip_vision import (
            CLIPVisionConfig, CLIPVisionModelWithProjection,
        )
        from drawingspinup_tpu.utils.diffusers_port import map_clip_key

        hf_cfg = transformers.CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=256, projection_dim=48,
            hidden_act="quick_gelu", layer_norm_eps=1e-5)
        torch.manual_seed(0)
        ref = transformers.CLIPVisionModelWithProjection(hf_cfg)
        ref.eval()

        cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                               num_layers=2, num_heads=4, mlp_ratio=4,
                               projection_dim=48)
        model = CLIPVisionModelWithProjection(cfg)
        x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = overlay_strict(params, state_numpy(ref), map_clip_key)

        with torch.no_grad():
            ref_emb = ref(torch.from_numpy(x).permute(0, 3, 1, 2)
                          ).image_embeds.numpy()
        emb = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        assert emb.shape == ref_emb.shape
        assert np.abs(emb - ref_emb).max() <= 1e-4 * max(
            np.abs(ref_emb).max(), 1.0)


# ---------------------------------------------------------------------------
# DDIM scheduler
# ---------------------------------------------------------------------------

class TestDDIMSchedulerOracle:
    @pytest.mark.parametrize("steps", [75, 50, 10])
    def test_timesteps(self, steps):
        from drawingspinup_tpu.ops import diffusion as D
        sched = DDIMSchedulerDouble()
        sched.set_timesteps(steps)
        ours = D.timesteps_for(D.DDIMConfig(), steps)
        np.testing.assert_array_equal(ours, sched.timesteps.numpy())

    def test_alphas_cumprod(self):
        from drawingspinup_tpu.ops import diffusion as D
        sched = DDIMSchedulerDouble()
        np.testing.assert_allclose(D.alphas_cumprod(D.DDIMConfig()),
                                   sched.alphas_cumprod.numpy(), rtol=1e-6)

    @pytest.mark.parametrize("eta", [0.0, 1.0, 0.3])
    @pytest.mark.parametrize("prediction_type",
                             ["epsilon", "v_prediction", "sample"])
    def test_step_trajectory(self, eta, prediction_type):
        """Full 10-step trajectory with a fake linear model, shared variance
        noise — includes the final step whose prev_timestep < 0."""
        from drawingspinup_tpu.ops import diffusion as D
        if prediction_type == "sample":
            pytest.skip("reference pipeline never configures sample-pred; "
                        "ops/diffusion supports epsilon|v_prediction only")
        cfg = D.DDIMConfig(prediction_type=prediction_type)
        sched = DDIMSchedulerDouble(prediction_type=prediction_type)
        steps = 10
        sched.set_timesteps(steps)
        ts = D.timesteps_for(cfg, steps)
        ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int64)
        acp = jnp.asarray(D.alphas_cumprod(cfg))

        rng = np.random.RandomState(3)
        x_ref = rng.randn(2, 4, 4, 3).astype(np.float32)
        x_ours = jnp.asarray(x_ref)
        x_ref = torch.from_numpy(x_ref)
        for i, t in enumerate(ts):
            # deterministic fake model: eps depends on the sample + t
            model_np = (np.tanh(np.asarray(x_ours)) * 0.5
                        + np.float32(t) / 1000.0)
            noise = rng.randn(*x_ref.shape).astype(np.float32)
            x_ref = sched.step(torch.from_numpy(model_np), int(t), x_ref,
                               eta=eta,
                               variance_noise=torch.from_numpy(noise))
            x_ours = D.ddim_step(cfg, acp, jnp.asarray(model_np),
                                 jnp.asarray(int(t)),
                                 jnp.asarray(int(ts_prev[i])), x_ours,
                                 eta=eta, noise=jnp.asarray(noise))
            np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(),
                                       atol=3e-5, rtol=1e-4)

    def test_reference_prev_timestep_matches_our_schedule(self):
        """Our explicit ts_prev (shifted schedule, -1 tail) must equal the
        reference's in-step ``t - ratio`` arithmetic at every step — incl.
        the final negative prev_timestep branch (both hit final_alpha)."""
        from drawingspinup_tpu.ops import diffusion as D
        cfg = D.DDIMConfig()
        for steps in (75, 50):
            ts = D.timesteps_for(cfg, steps)
            ratio = cfg.num_train_timesteps // steps
            ref_prev = ts - ratio
            ours_prev = np.concatenate([ts[1:], [-1]])
            np.testing.assert_array_equal(ref_prev[:-1], ours_prev[:-1])
            assert ref_prev[-1] < 0 and ours_prev[-1] < 0


# ---------------------------------------------------------------------------
# Full denoise-loop + classifier-free-guidance oracle
# ---------------------------------------------------------------------------

class TestDenoiseLoopCFGOracle:
    """MVPipeline's jitted sample loop vs the reference's denoise loop
    (pipeline_mvdiffusion_image.py:460-486) executed in torch over the
    reference's OWN UNet: CFG batch doubling + zeroed uncond conditioning
    (:327-339,166-183) + guided eps combine (:472-476) + DDIM step. eta=0
    (deterministic DDIM) so no RNG has to line up across frameworks;
    guidance=1.0 exercises the single-batch branch of both loops."""

    @pytest.mark.parametrize("guidance", [1.0, 3.0])
    def test_loop_parity(self, guidance):
        from drawingspinup_tpu.models.unet_mv2d import UNetMV2D, UNetMVConfig
        from drawingspinup_tpu.pipelines import stage2_mv as mv
        from drawingspinup_tpu.utils.diffusers_port import map_unet_key

        flax_cfg = UNetMVConfig(cd_attention_mid=True, **TINY)
        ref_mod = import_reference_mvdiffusion()
        torch.manual_seed(11)
        ref = ref_mod.UNetMV2DConditionModel(**_ref_unet_kwargs(flax_cfg))
        ref.eval()
        ref.enable_xformers_memory_efficient_attention()

        nv2 = flax_cfg.num_views * 2
        hw, s, steps = 8, 2, 4
        rng = np.random.RandomState(7)
        latents0 = rng.randn(nv2, hw, hw, 4).astype(np.float32)
        cond = rng.randn(nv2, hw, hw, 4).astype(np.float32)
        embeds = rng.randn(nv2, s, flax_cfg.cross_attention_dim
                           ).astype(np.float32)
        cam = rng.randn(nv2, 10).astype(np.float32)

        # ours: the pipeline's own jitted loop (pre-doubled conditioning,
        # exactly as __call__ prepares it)
        unet = UNetMV2D(flax_cfg)
        init_in = jnp.concatenate([jnp.asarray(latents0),
                                   jnp.asarray(cond)], axis=-1)
        params = unet.init(jax.random.PRNGKey(0), init_in,
                           jnp.asarray(0, jnp.int32),
                           jnp.asarray(embeds), jnp.asarray(cam))["params"]
        params = overlay_strict(params, state_numpy(ref), map_unet_key)
        pcfg = mv.MVPipelineConfig(
            unet=flax_cfg, num_views=flax_cfg.num_views,
            num_inference_steps=steps, eta=0.0, guidance_scale=guidance,
            compute_dtype="float32")
        pipe = mv.MVPipeline(pcfg, {"unet": params})
        sample_loop, _ = pipe._sample_fns()
        if guidance != 1.0:
            embeds_in = np.concatenate([np.zeros_like(embeds), embeds])
            cond_in = np.concatenate([np.zeros_like(cond), cond])
            cam_in = np.concatenate([cam, cam])
        else:
            embeds_in, cond_in, cam_in = embeds, cond, cam
        ours = np.asarray(sample_loop(
            params, jnp.asarray(cond_in), jnp.asarray(embeds_in),
            jnp.asarray(cam_in), jnp.asarray(latents0),
            jax.random.PRNGKey(0)))

        # reference loop in torch (NCHW)
        sched = DDIMSchedulerDouble()
        sched.set_timesteps(steps)
        lat = torch.from_numpy(latents0).permute(0, 3, 1, 2)
        cond_t = torch.from_numpy(cond_in).permute(0, 3, 1, 2)
        embeds_t = torch.from_numpy(embeds_in)
        cam_t = torch.from_numpy(cam_in)
        with torch.no_grad():
            for t in sched.timesteps:
                lat_in = torch.cat([lat] * 2) if guidance != 1.0 else lat
                inp = torch.cat([lat_in, cond_t], dim=1)
                eps = ref(inp, t, encoder_hidden_states=embeds_t,
                          class_labels=cam_t, return_dict=False)[0]
                if guidance != 1.0:
                    eps_uncond, eps_cond = eps.chunk(2)
                    eps = eps_uncond + guidance * (eps_cond - eps_uncond)
                lat = sched.step(eps, int(t), lat, eta=0.0)
        theirs = lat.permute(0, 2, 3, 1).numpy()

        scale = np.abs(theirs).max()
        assert np.abs(ours - theirs).max() <= 5e-4 * max(scale, 1.0), (
            np.abs(ours - theirs).max(), scale)

    def test_guidance_changes_output(self):
        """The knob is live: guidance 3.0 must not silently equal 1.0
        (the round-3 dead-knob failure mode)."""
        from drawingspinup_tpu.models.unet_mv2d import UNetMV2D, UNetMVConfig
        from drawingspinup_tpu.pipelines import stage2_mv as mv

        flax_cfg = UNetMVConfig(cd_attention_mid=True, **TINY)
        nv2 = flax_cfg.num_views * 2
        rng = np.random.RandomState(1)
        latents0 = rng.randn(nv2, 8, 8, 4).astype(np.float32)
        cond = rng.randn(nv2, 8, 8, 4).astype(np.float32)
        embeds = rng.randn(nv2, 2, flax_cfg.cross_attention_dim
                           ).astype(np.float32)
        cam = rng.randn(nv2, 10).astype(np.float32)
        unet = UNetMV2D(flax_cfg)
        params = unet.init(
            jax.random.PRNGKey(2),
            jnp.concatenate([jnp.asarray(latents0), jnp.asarray(cond)],
                            axis=-1),
            jnp.asarray(0, jnp.int32), jnp.asarray(embeds),
            jnp.asarray(cam))["params"]

        outs = {}
        for g in (1.0, 3.0):
            pcfg = mv.MVPipelineConfig(
                unet=flax_cfg, num_views=flax_cfg.num_views,
                num_inference_steps=3, eta=0.0, guidance_scale=g,
                compute_dtype="float32")
            pipe = mv.MVPipeline(pcfg, {"unet": params})
            loop, _ = pipe._sample_fns()
            if g != 1.0:
                e = np.concatenate([np.zeros_like(embeds), embeds])
                c = np.concatenate([np.zeros_like(cond), cond])
                k = np.concatenate([cam, cam])
            else:
                e, c, k = embeds, cond, cam
            outs[g] = np.asarray(loop(params, jnp.asarray(c), jnp.asarray(e),
                                      jnp.asarray(k), jnp.asarray(latents0),
                                      jax.random.PRNGKey(0)))
        assert np.abs(outs[1.0] - outs[3.0]).max() > 1e-3
