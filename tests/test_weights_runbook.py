"""Dry-run of scripts/fetch_and_verify_weights.py's offline plumbing
(VERDICT r3 next #9): synthetic checkpoints in the real on-disk formats
(diffusers-layout safetensors dir, torchvision-schema npz) flow through the
script's verify() and the production ingestion seams end-to-end. The
isnet/lama assets are absent here — their ingestion paths have their own
tests (test_isnet.py porter roundtrip, test_checkpoint_ingestion.py LaMa
ckpt) — so verify() must report them 'missing', not crash.
"""

from __future__ import annotations

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from tests.diffusers_double import (  # noqa: E402
    AutoencoderKLDouble, import_reference_mvdiffusion,
)


def _save_safetensors(state: dict, path: str) -> None:
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in state.items()}, path)


@pytest.fixture()
def synthetic_weights(tmp_path):
    """weights dir with tiny wonder3d/ (unet+vae+image_encoder safetensors)
    and a synthetic vgg19_features.npz — matching verify(tiny=True)'s model
    configs."""
    w = tmp_path / "weights"
    ref_mod = import_reference_mvdiffusion()
    torch.manual_seed(0)
    unet = ref_mod.UNetMV2DConditionModel(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlockMV2D", "DownBlock2D"),
        mid_block_type="UNetMidBlockMV2DCrossAttn",
        up_block_types=("UpBlock2D", "CrossAttnUpBlockMV2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4,
        class_embed_type="projection",
        projection_class_embeddings_input_dim=10, num_views=6,
        cd_attention_mid=True)
    _save_safetensors(unet.state_dict(),
                      str(w / "wonder3d" / "unet"
                          / "diffusion_pytorch_model.safetensors"))
    vae = AutoencoderKLDouble(block_out_channels=(32, 64),
                              layers_per_block=1)
    _save_safetensors(vae.state_dict(),
                      str(w / "wonder3d" / "vae"
                          / "diffusion_pytorch_model.safetensors"))
    transformers = pytest.importorskip("transformers")
    clip = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=256, projection_dim=16,
            hidden_act="quick_gelu"))
    _save_safetensors(clip.state_dict(),
                      str(w / "wonder3d" / "image_encoder"
                          / "model.safetensors"))
    # vgg npz at the export_vgg19_npz key schema (features.N.weight, OIHW)
    rng = np.random.RandomState(0)
    cfgs = [(64, 3), (64, 64), (128, 64), (128, 128)]
    data = {}
    for ti, (o, i) in zip((0, 2, 5, 7), cfgs):
        data[f"features.{ti}.weight"] = rng.randn(o, i, 3, 3).astype(
            np.float32)
        data[f"features.{ti}.bias"] = rng.randn(o).astype(np.float32)
    np.savez(str(w / "vgg19_features.npz"), **data)
    return str(w)


def test_verify_plumbing(synthetic_weights, capsys):
    from fetch_and_verify_weights import verify

    results = verify(synthetic_weights, tiny=True)
    assert results["wonder3d"].startswith("ok"), results["wonder3d"]
    assert results["vgg19"].startswith("ok"), results["vgg19"]
    assert results["isnet"] == "missing"
    assert results["lama"] == "missing"
    out = capsys.readouterr()
    # the overlay must actually load real tensors, not silently skip
    assert "loaded" in out.out


def test_cli_exit_codes(synthetic_weights):
    from fetch_and_verify_weights import main

    assert main(["--verify", "--tiny", "--weights", synthetic_weights]) == 0
    # a corrupt asset must be a nonzero exit, not a silent pass
    bad = os.path.join(synthetic_weights, "vgg19_features.npz")
    with open(bad, "wb") as f:
        f.write(b"not an npz")
    assert main(["--verify", "--tiny", "--weights", synthetic_weights]) == 1


@pytest.mark.skip(reason="acceptance bar: needs real Wonder3D/VGG/ISNet/LaMa "
                         "weights + a reference-produced output tree "
                         "(unreachable from this zero-egress environment); "
                         "run scripts/fetch_and_verify_weights.py --fetch "
                         "then --fidelity on a connected box — passes when "
                         "per-stage LPIPS <= 0.02 (BASELINE.md north star)")
def test_real_weights_fidelity_acceptance():
    raise AssertionError("unreachable")
