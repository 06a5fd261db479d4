"""Stage-3 tests: generator/discriminator shapes, RIC rotation sampling,
patch sampling, and a short GAN training run on a synthetic pair."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu.models.generator_j import (
    DiscriminatorN_IN, GeneratorJ, GeneratorJ_RIC, PerceptualVGG19,
    bilinear_gather, ric_sample_positions,
)
from drawingspinup_tpu.pipelines import stage3_data
from drawingspinup_tpu.train import gan


class TestModels:
    def test_generator_j_shapes(self, rng):
        g = GeneratorJ(filters=(8, 16, 32, 32, 32, 16), resnet_blocks=2)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 6)).astype(np.float32))
        v = g.init(jax.random.PRNGKey(0), x, train=True)
        y = g.apply(v, x, train=False)
        assert y.shape == (2, 32, 32, 3)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh

    def test_generator_ric_shapes(self, rng):
        g = GeneratorJ_RIC(filters=(8, 16, 32, 32, 32, 16), resnet_blocks=2)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        v = g.init(jax.random.PRNGKey(0), x, train=True)
        y = g.apply(v, x, train=False)
        assert y.shape == (1, 32, 32, 3)

    def test_discriminator(self, rng):
        d = DiscriminatorN_IN(num_filters=12, n_layers=2)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        v = d.init(jax.random.PRNGKey(0), x)
        score, aux = d.apply(v, x)
        assert score.shape[0] == 2 and score.shape[-1] == 1
        assert aux is None

    def test_bf16_dtype_forward_close_to_f32(self, rng):
        """compute dtype bf16 (GANConfig.compute_dtype): same f32 params,
        bf16 activations — outputs stay f32 at the boundary and close to
        the f32 forward (bf16 has ~3 decimal digits; tanh bounds [-1,1])."""
        f = (8, 16, 32, 32, 32, 16)
        g32 = GeneratorJ_RIC(filters=f, resnet_blocks=2)
        g16 = GeneratorJ_RIC(filters=f, resnet_blocks=2,
                             dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        v = g32.init(jax.random.PRNGKey(0), x, train=True)
        y32 = g32.apply(v, x, train=False)
        y16 = g16.apply(v, x, train=False)
        assert y16.dtype == jnp.float32
        assert float(jnp.abs(y16 - y32).max()) < 0.15
        assert float(jnp.abs(y16 - y32).mean()) < 0.03

    def test_vgg_features_deterministic(self, rng):
        vgg = PerceptualVGG19()
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v1 = vgg.init(jax.random.PRNGKey(12345), x)
        v2 = vgg.init(jax.random.PRNGKey(12345), x)
        f1 = vgg.apply(v1, x)
        f2 = vgg.apply(v2, x)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        # features distinguish different inputs
        f3 = vgg.apply(v1, x * 0.5)
        assert float(jnp.abs(f1 - f3).mean()) > 0


class TestRIC:
    def test_positions_center_tap_identity(self):
        pos = ric_sample_positions(8, 8)
        base = np.stack(np.meshgrid(np.arange(8.0), np.arange(8.0),
                                    indexing="ij"), -1)
        np.testing.assert_allclose(pos[:, :, 4], base, atol=1e-5)

    def test_positions_on_unit_circle(self):
        pos = ric_sample_positions(9, 9)
        base = np.stack(np.meshgrid(np.arange(9.0), np.arange(9.0),
                                    indexing="ij"), -1)
        for tap in [0, 1, 2, 3, 5, 6, 7, 8]:
            d = pos[:, :, tap] - base
            r = np.hypot(d[..., 0], d[..., 1])
            np.testing.assert_allclose(r, 1.0, atol=1e-4)

    def test_bilinear_gather_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        base = np.stack(np.meshgrid(np.arange(8.0), np.arange(8.0),
                                    indexing="ij"), -1).astype(np.float32)
        out = bilinear_gather(x, jnp.asarray(base))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_variant_equivalence_values_and_grads(self, rng):
        """fused (train-optimal) and pershift (inference-optimal) RICConv
        schedules are the same operator: same params, same output, same
        gradients (exact at precision=highest; the default-precision delta
        is bf16 matmul-input rounding common to both)."""
        from drawingspinup_tpu.models.generator_j import RICConv
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 5)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((2, 12, 12, 7)).astype(np.float32))
        mods = {v: RICConv(features=7, variant=v)
                for v in ("fused", "pershift")}
        params = mods["fused"].init(jax.random.PRNGKey(0), x)
        outs, grads = {}, {}
        with jax.default_matmul_precision("highest"):
            for v, m in mods.items():
                outs[v] = m.apply(params, x)
                grads[v] = jax.grad(
                    lambda p, xx: jnp.sum(m.apply(p, xx) * g),
                    argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(outs["fused"]),
                                   np.asarray(outs["pershift"]),
                                   rtol=1e-5, atol=1e-5)
        for (a, b) in zip(jax.tree.leaves(grads["fused"]),
                          jax.tree.leaves(grads["pershift"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def make_synthetic_keyframe(tmp_path, size=64):
    """Rendered rest-pose pair: color/pos/edge passes + a 'drawing'."""
    from drawingspinup_tpu.core.io import write_image
    yy, xx = np.mgrid[0:size, 0:size]
    mask = (np.hypot(yy - size / 2, xx - size / 2) < size * 0.4)
    color = np.zeros((size, size, 4), np.float32)
    color[..., 0] = np.where(mask, 0.8, 0)
    color[..., 1] = np.where(mask, 0.4, 0)
    color[..., 3] = mask
    pos = np.zeros((size, size, 3), np.float32)
    pos[..., 0] = xx / size
    pos[..., 1] = yy / size
    pos *= mask[..., None]
    edge = np.ones((size, size), np.float32)
    edge[mask & (np.hypot(yy - size / 2, xx - size / 2) > size * 0.35)] = 0
    action = tmp_path / "rest_pose"
    write_image(str(action / "color" / "0001.png"), color)
    write_image(str(action / "pos" / "0001.png"), pos)
    write_image(str(action / "edge" / "0001.png"), edge)
    post = color.copy()
    post[..., :3] = np.where(mask[..., None], [[0.9, 0.7, 0.5]], 0)
    write_image(str(tmp_path / "char" / "drawing.png"), post)
    return str(action), str(tmp_path / "char" / "drawing.png")


class TestData:
    def test_keyframe_loading(self, tmp_path):
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post,
                                              use_mask=True, use_pos=True)
        assert data.pre.shape[-1] == 6
        assert data.post.shape[-1] == 3
        assert len(data.valid_yx) > 100
        # normalized ranges
        assert float(data.pre[..., :3].min()) >= -1.0

    def test_edge_mode_doubles_width(self, tmp_path):
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post,
                                              use_mask=True, use_pos=True,
                                              use_edge=True)
        assert data.pre.shape[1] == 2 * data.pre.shape[0]

    def test_patch_sampling(self, tmp_path):
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post)
        batch = stage3_data.sample_patches(data, jax.random.PRNGKey(0), 8, 16)
        assert batch["pre"].shape == (8, 16, 16, 6)
        assert batch["post"].shape == (8, 16, 16, 3)
        # patches centered on valid pixels → mask coverage is substantial
        assert float(batch["pre_mask"].mean()) > 0.2


TINY_GAN = gan.GANConfig(generator="GeneratorJ",
                         filters=(8, 16, 16, 16, 16, 8), resnet_blocks=1,
                         batch_size=8, patch_size=16, input_channels=6)


class TestGANTraining:
    def test_losses_decrease(self, tmp_path):
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post)
        state = gan.init_state(TINY_GAN, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        first = last = None
        for i in range(40):
            key, k = jax.random.split(key)
            state, logs = gan.train_step(TINY_GAN, state, data, k)
            if i == 0:
                first = float(logs["image_loss"])
        last = float(logs["image_loss"])
        assert np.isfinite(last) and last < first

    def test_full_frame_and_checkpoint(self, tmp_path):
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post)
        state = gan.init_state(TINY_GAN, jax.random.PRNGKey(0))
        frame, mask = stage3_data.load_full_frame(action, "0001.png",
                                                  use_mask=True, use_pos=True,
                                                  use_edge=False)
        out = gan.generate_full(TINY_GAN, state, frame)
        assert out.shape == (64, 64, 3)
        log_dir = str(tmp_path / "logs")
        os.makedirs(log_dir)
        gan.save_checkpoint(log_dir, state, 7)
        restored = gan.load_checkpoint(log_dir, state)
        chex = jax.tree_util.tree_all(
            jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                         state.g_params, restored.g_params))
        assert chex

    def test_u8_full_frame_matches_f32_path(self, tmp_path):
        """The u8-transfer eval path (device-side feature assembly +
        quantized output) writes the same PNG pixels as the f32 path up
        to rounding: XLA fuses the in-graph x/255*2-1 feature math
        differently from the host numpy chain, so generator outputs can
        differ by ulps and flip the final u8 quantization by ±1 LSB on a
        few pixels. Alpha (a straight u8 round-trip) must be exact."""
        action, post = make_synthetic_keyframe(tmp_path)
        state = gan.init_state(TINY_GAN, jax.random.PRNGKey(0))
        for use_edge in (False, True):
            if use_edge:
                # synthesize an edge pass (some pixels < 255)
                edge = np.full((64, 64), 255, np.uint8)
                edge[10:20, 10:50] = 0
                from drawingspinup_tpu.core.io import write_image as _wi
                os.makedirs(os.path.join(action, "edge"), exist_ok=True)
                _wi(os.path.join(action, "edge", "0001.png"),
                    edge.astype(np.float32) / 255.0)
            frame, mask = stage3_data.load_full_frame(
                action, "0001.png", use_mask=True, use_pos=True,
                use_edge=use_edge)
            rgb = gan.generate_full(TINY_GAN, state, frame)
            want = np.concatenate(
                [np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8),
                 np.clip(mask[..., None] * 255.0 + 0.5, 0,
                         255).astype(np.uint8)], axis=-1)
            x_u8 = stage3_data.load_full_frame_u8(action, "0001.png",
                                                  use_edge)
            got = np.asarray(gan.generate_full_rgba_async(
                TINY_GAN, state, x_u8, True, True, use_edge))
            assert got.dtype == np.uint8 and got.shape == want.shape
            np.testing.assert_array_equal(
                got[..., 3], want[..., 3],
                err_msg=f"alpha mismatch (use_edge={use_edge})")
            diff = np.abs(got[..., :3].astype(np.int16)
                          - want[..., :3].astype(np.int16))
            assert diff.max() <= 1, \
                f"RGB diff > 1 LSB (use_edge={use_edge}): {diff.max()}"
            frac = float((diff > 0).mean())
            assert frac < 0.02, \
                f"{frac:.1%} of RGB pixels differ (use_edge={use_edge})"

    def test_ric_variant_trains(self, tmp_path):
        cfg = dataclasses.replace(TINY_GAN, generator="GeneratorJ_RIC")
        action, post = make_synthetic_keyframe(tmp_path)
        data = stage3_data.load_keyframe_pair(action, "color", post)
        state = gan.init_state(cfg, jax.random.PRNGKey(0))
        state, logs = gan.train_step(cfg, state, data, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs["g_loss"]))


def test_reference_config_yaml_twins():
    """Every reference config has a repo twin the CLIs load (VERDICT r1 #6):
    config_stage{1,2}.yaml knob names map onto GANConfig 1:1."""
    from drawingspinup_tpu.pipelines import stage3_translate as st

    cfg1, ex1 = st.gan_config_from_yaml(st.DEFAULT_STAGE_CFGS[1])
    assert cfg1.generator == "GeneratorJ_RIC"
    assert cfg1.epochs == 3
    assert cfg1.input_channels == 6          # 3 + mask + pos.xy
    assert cfg1.batch_size == 40 and cfg1.patch_size == 32
    assert cfg1.reconstruction_weight == 4.0
    assert cfg1.perception_weight == 6.0
    assert cfg1.adversarial_weight == 0.5
    assert cfg1.lr == 4e-4 and cfg1.weight_decay == 1e-5
    assert cfg1.disc_filters == 12 and cfg1.disc_layers == 2
    assert ex1["pre_dir"] == "color"
    assert ex1["post_name"] == "ffc_resnet_inpainted"

    cfg2, ex2 = st.gan_config_from_yaml(st.DEFAULT_STAGE_CFGS[2])
    assert cfg2.generator == "GeneratorJ"
    assert cfg2.epochs == 2
    assert ex2["pre_dir"] == "res_stage1_mask_pos"
    assert ex2["post_name"] == "texture_with_bg"

    # flag semantics: --no_mask/--no_pos shrink the channel count exactly as
    # reference train_stage1.py:27-33
    cfg_nm, _ = st.gan_config_from_yaml(st.DEFAULT_STAGE_CFGS[1],
                                        use_mask=False, use_pos=False)
    assert cfg_nm.input_channels == 3


def test_mvdiffusion_config_yaml_twin():
    import os

    from drawingspinup_tpu.core import load_config
    path = os.path.join(os.path.dirname(__file__), "..",
                        "drawingspinup_tpu", "configs",
                        "mvdiffusion-joint-ortho-6views.yaml")
    y = load_config(path)
    assert y["pipe_validation_kwargs"]["num_inference_steps"] == 75
    assert y["pipe_validation_kwargs"]["guidance_scale"] == 1.0
    assert y["pipe_validation_kwargs"]["eta"] == 1.0
    assert y["validation_dataset"]["img_wh"] == [256, 256]
    assert y["seed"] == 123456
    assert len(y["views"]) == 6


def test_gan_vgg_npz_overlay(tmp_path, capsys):
    """init_state overlays real VGG weights when DSU_VGG19_NPZ points at an
    npz (VERDICT r1 #5), and warns LOUDLY on the random-feature fallback."""
    import os

    import jax
    import numpy as np

    from drawingspinup_tpu.train import gan

    cfg = gan.GANConfig(generator="GeneratorJ", input_channels=3,
                        batch_size=2, patch_size=16)
    # fallback: loud warning on stderr (warned ONCE per component per
    # process — reset the policy so an earlier test hasn't consumed it)
    from drawingspinup_tpu.core import weights_policy
    weights_policy.reset_degradations()
    gan.init_state(cfg, jax.random.PRNGKey(0))
    err = capsys.readouterr().err
    assert "FIXED RANDOM VGG" in err

    rng = np.random.default_rng(0)
    data = {}
    for i, (o, c) in enumerate(zip([64, 64, 128, 128], [3, 64, 64, 128])):
        ti = [0, 2, 5, 7][i]
        data[f"features.{ti}.weight"] = \
            rng.standard_normal((o, c, 3, 3)).astype(np.float32)
        data[f"features.{ti}.bias"] = np.zeros(o, np.float32)
    npz = tmp_path / "vgg.npz"
    np.savez(npz, **data)

    state = gan.init_state(
        gan.GANConfig(generator="GeneratorJ", input_channels=3,
                      batch_size=2, patch_size=16, vgg_npz=str(npz)),
        jax.random.PRNGKey(0))
    out = capsys.readouterr().out
    assert "real VGG19 weights" in out
    got = np.asarray(state.vgg_params["vggconv0"]["kernel"])
    want = data["features.0.weight"].transpose(2, 3, 1, 0)
    assert np.allclose(got, want)
