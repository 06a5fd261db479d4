"""Degraded-weights policy (core/weights_policy.py): production CLIs fail
without real pretrained weights unless explicitly allowed; library entry
points warn once and record. VERDICT r4 weak #2/#3."""
import numpy as np
import pytest

import jax

from drawingspinup_tpu.core import weights_policy
from drawingspinup_tpu.train import gan

TINY_GAN = gan.GANConfig(generator="GeneratorJ",
                         filters=(8, 16, 16, 16, 16, 8), resnet_blocks=1,
                         batch_size=8, patch_size=16, input_channels=6)


@pytest.fixture(autouse=True)
def _clean_policy(monkeypatch):
    monkeypatch.delenv("DSU_ALLOW_DEGRADED_WEIGHTS", raising=False)
    monkeypatch.delenv("DSU_VGG19_NPZ", raising=False)
    monkeypatch.delenv("DSU_ISNET_CKPT", raising=False)
    monkeypatch.delenv("DSU_ISNET_ONNX", raising=False)
    weights_policy.set_strict(False)
    weights_policy.reset_degradations()
    yield
    weights_policy.set_strict(False)
    weights_policy.reset_degradations()


class TestPolicy:
    def test_strict_mode_fails_without_vgg(self):
        weights_policy.set_strict(True)
        with pytest.raises(weights_policy.DegradedWeightsError,
                           match="RANDOM VGG"):
            gan.init_state(TINY_GAN, jax.random.PRNGKey(0))

    def test_env_optin_unlocks_strict_mode(self, monkeypatch):
        monkeypatch.setenv("DSU_ALLOW_DEGRADED_WEIGHTS", "1")
        weights_policy.set_strict(True)
        state = gan.init_state(TINY_GAN, jax.random.PRNGKey(0))
        assert state.g_params
        assert any(d["component"] == "gan-vgg19"
                   for d in weights_policy.degradations())

    def test_library_default_warns_and_records(self, capsys):
        state = gan.init_state(TINY_GAN, jax.random.PRNGKey(0))
        assert state.g_params
        degs = weights_policy.degradations()
        assert [d["component"] for d in degs] == ["gan-vgg19"]
        assert degs[0]["severity"] == "fail"
        assert "RANDOM VGG" in capsys.readouterr().err

    def test_isnet_heuristic_records_but_never_fails(self):
        from drawingspinup_tpu.pipelines.stage2_mv import background_removal
        weights_policy.set_strict(True)   # warn-class even in strict mode
        img = np.ones((32, 32, 3), np.float32)
        img[8:24, 8:24] = 0.2
        mask = background_removal(img)
        assert mask.shape == (32, 32) and mask[16, 16] == 1.0
        degs = weights_policy.degradations()
        assert [d["component"] for d in degs] == ["isnet"]
        assert degs[0]["severity"] == "warn"

    def test_corrupt_onnx_records_error(self, tmp_path, monkeypatch):
        from drawingspinup_tpu.pipelines.stage2_mv import background_removal
        bad = tmp_path / "corrupt.onnx"
        bad.write_bytes(b"not an onnx file")
        monkeypatch.setenv("DSU_ISNET_ONNX", str(bad))
        img = np.ones((16, 16, 3), np.float32)
        img[4:12, 4:12] = 0.0
        background_removal(img)
        comps = {d["component"] for d in weights_policy.degradations()}
        assert "isnet-onnx" in comps     # logged, not silently swallowed
        assert "isnet" in comps          # and the fallback is recorded

    def test_warning_emitted_once_per_component(self, capsys):
        weights_policy.report_degraded("x", "msg one")
        weights_policy.report_degraded("x", "msg one")
        assert capsys.readouterr().err.count("WARNING: [x]") == 1


class TestCLIWiring:
    def test_train_stage1_strict_by_default(self, monkeypatch, tmp_path):
        """The production CLI refuses random-VGG training up front."""
        from drawingspinup_tpu.cli import train_stage1
        with pytest.raises(weights_policy.DegradedWeightsError):
            train_stage1.main(["--uid", "nope", "--root", str(tmp_path),
                               "--max-batches", "1"])

    def test_train_stage1_optin_flag(self, monkeypatch, tmp_path):
        """--allow-degraded-weights reaches train_stage (which then fails on
        the empty data dir, proving the policy gate was passed)."""
        from drawingspinup_tpu.cli import train_stage1
        with pytest.raises(Exception) as ei:
            train_stage1.main(["--uid", "nope", "--root", str(tmp_path),
                               "--allow-degraded-weights",
                               "--max-batches", "1"])
        assert not isinstance(ei.value, weights_policy.DegradedWeightsError)
