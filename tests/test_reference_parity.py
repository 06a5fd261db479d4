"""Reference-oracle parity tests (VERDICT round-1, item 1).

Instantiate the reference's own PyTorch modules (importable offline with
kornia/torchvision stubbed, see reference_oracle.py), randomize their
weights, port the state_dicts through utils/torch_port.py, and assert the
flax rebuild produces the same outputs. This is the strongest correctness
evidence available without shipped checkpoints: if these pass, a real
reference checkpoint ports with the same code path.

Oracle inventory: see PARITY.md "Fidelity proof layer" — this file covers
the FFC generator/discriminator, the full pix2pixHD zoo, GeneratorJ/
DiscriminatorN/VGG19/RIC offsets, VanillaMLP/VanillaFrequency/trunc_exp,
criterions + neus_ortho loss formulas + NeuS get_alpha, ortho rays + the
nine fixed poses + world-normal chain + contractions + PCA shear, the LR
trajectory, the SingleImageDataset conditioning, and the MV/joint/sparse
attention processors (ast-extracted reference source).
"""

from __future__ import annotations

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from drawingspinup_tpu.utils import torch_port  # noqa: E402

import reference_oracle as oracle  # noqa: E402  (tests dir on sys.path)


def _randomize_(module: "torch.nn.Module", seed: int) -> None:
    """Replace every parameter/buffer with seeded random values so parity is
    tested at non-default weights (BN running stats included)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.copy_(0.5 + torch.rand(b.shape, generator=g))
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)


def _to_numpy_sd(module: "torch.nn.Module") -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class TestFFCGeneratorParity:
    def test_forward_parity_512(self):
        """Full lama-fourier generator: ported weights, 512² input, fp32."""
        ref_ffc = oracle.import_reference_ffc()
        kwargs = dict(ratio_gin=0, ratio_gout=0, enable_lfu=False)
        tm = ref_ffc.FFCResNetGenerator(
            input_nc=4, output_nc=1, ngf=64, n_downsampling=3, n_blocks=9,
            add_out_act="sigmoid",
            init_conv_kwargs=kwargs, downsample_conv_kwargs=dict(kwargs),
            resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75,
                                    enable_lfu=False))
        _randomize_(tm, seed=7)
        tm.eval()

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 4, 512, 512)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.ffc import FFCResNetGenerator
        fm = FFCResNetGenerator()
        variables = torch_port.convert_ffc_generator(_to_numpy_sd(tm))
        out = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        out = np.asarray(out).transpose(0, 3, 1, 2)

        assert out.shape == ref.shape
        err = np.abs(out - ref).max()
        assert err < 1e-3, f"FFC generator parity error {err}"

    def test_port_covers_all_torch_params(self):
        """Every torch key the reference checkpoint would carry is consumed
        by the key map (no silently dropped weights)."""
        ref_ffc = oracle.import_reference_ffc()
        kwargs = dict(ratio_gin=0, ratio_gout=0, enable_lfu=False)
        tm = ref_ffc.FFCResNetGenerator(
            input_nc=4, output_nc=1, add_out_act="sigmoid",
            init_conv_kwargs=kwargs, downsample_conv_kwargs=dict(kwargs),
            resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75,
                                    enable_lfu=False))
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in torch_port.ffc_generator_key_map()}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestGeneratorJParity:
    CFG = dict(resnet_blocks=7, use_bias=False, tanh=True,
               append_smoothers=True)

    def _ref_model(self):
        m = oracle.import_reference_stage3_models()
        tm = m.GeneratorJ(norm_layer="batch_norm",
                          filters=(32, 64, 128, 128, 128, 64),
                          input_channels=3, **self.CFG)
        _randomize_(tm, seed=11)
        tm.eval()
        return tm

    def test_forward_parity(self):
        tm = self._ref_model()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.generator_j import GeneratorJ
        fm = GeneratorJ(filters=(32, 64, 128, 128, 128, 64), **self.CFG)
        variables = torch_port.convert_generator_j(_to_numpy_sd(tm))
        out = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        out = np.asarray(out).transpose(0, 3, 1, 2)
        assert out.shape == ref.shape
        err = np.abs(out - ref).max()
        assert err < 1e-4, f"GeneratorJ parity error {err}"

    def test_port_covers_all_torch_params(self):
        tm = self._ref_model()
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in torch_port.generator_j_key_map(**self.CFG)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestDiscriminatorNParity:
    def test_forward_parity(self):
        m = oracle.import_reference_stage3_models()
        tm = m.DiscriminatorN_IN(num_filters=12, input_channels=3, n_layers=2)
        _randomize_(tm, seed=13)
        tm.eval()
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tm(torch.from_numpy(x))
        ref = ref.numpy()

        from drawingspinup_tpu.models.generator_j import DiscriminatorN_IN
        fm = DiscriminatorN_IN(num_filters=12, n_layers=2)
        variables = torch_port.convert_discriminator_n(_to_numpy_sd(tm))
        out, _ = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
        out = np.asarray(out).transpose(0, 3, 1, 2)
        assert out.shape == ref.shape
        err = np.abs(out - ref).max()
        assert err < 1e-4, f"DiscriminatorN_IN parity error {err}"


class TestPerceptualVGGParity:
    def test_feature_parity_with_ported_weights(self, tmp_path):
        """Layer-for-layer parity of the {0,3,5} feature taps with weights
        ported through the documented npz overlay path
        (torch features state_dict → vgg19_features_to_npz →
        load_vgg_weights_npz)."""
        m = oracle.import_reference_stage3_models()
        tm = m.PerceptualVGG19(feature_layers=[0, 3, 5],
                               use_normalization=False)
        _randomize_(tm.model.features, seed=17)
        tm.eval()

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        feats_ref = []
        with torch.no_grad():
            h = torch.from_numpy(x)
            for f in range(6):
                h = tm.model.features[f](h)
                if f in (0, 3, 5):
                    # .copy(): features[1] is ReLU(inplace=True) and would
                    # mutate the collected pre-relu map through the shared
                    # buffer (the reference clones for the same reason,
                    # models.py:538-540)
                    feats_ref.append(h.numpy().copy())

        npz = str(tmp_path / "vgg19_features.npz")
        torch_port.vgg19_features_to_npz(
            _to_numpy_sd(tm.model.features), npz)

        import jax
        from drawingspinup_tpu.models.generator_j import (
            PerceptualVGG19, load_vgg_weights_npz)
        fm = PerceptualVGG19(feature_layers=(0, 3, 5),
                             use_normalization=False)
        variables = fm.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 3, 32, 32)).transpose(0, 2, 3, 1))
        variables = load_vgg_weights_npz(variables, npz)
        outs = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        as_list=True)
        assert len(outs) == 3
        for got, want in zip(outs, feats_ref):
            got = np.asarray(got).transpose(0, 3, 1, 2)
            assert got.shape == want.shape
            err = np.abs(got - want).max()
            assert err < 1e-4, f"VGG feature parity error {err}"

    def test_full_reference_run_contract(self):
        """The reference run() concat (models.py:531-541) and our flattened
        concat carry the same per-layer energy (the perceptual loss is a
        squared distance, invariant to flatten order)."""
        m = oracle.import_reference_stage3_models()
        tm = m.PerceptualVGG19(feature_layers=[0, 3, 5],
                               use_normalization=False)
        tm.eval()
        x = torch.zeros(1, 3, 32, 32)
        with torch.no_grad():
            _, flat = tm(x)
        # 64·32² + 64·32² + 128·16² = 163840
        assert flat.shape == (1, 64 * 32 * 32 + 64 * 32 * 32 + 128 * 16 * 16)


class TestCriterionsOracle:
    def test_binary_cross_entropy(self):
        ref = oracle.import_reference_criterions()
        rng = np.random.default_rng(4)
        x = rng.uniform(1e-3, 1 - 1e-3, size=(256,)).astype(np.float32)
        t = (rng.uniform(size=(256,)) > 0.5).astype(np.float32)
        want = ref.binary_cross_entropy(torch.from_numpy(x),
                                        torch.from_numpy(t)).item()
        from drawingspinup_tpu.train.losses import binary_cross_entropy
        got = float(jnp.mean(binary_cross_entropy(jnp.asarray(x),
                                                  jnp.asarray(t))))
        assert abs(got - want) < 1e-5

    def test_ranking_loss_on_sorted_input(self):
        """On pre-sorted errors the reference's double-indexing quirk
        (criterions.py:18-20) is a no-op, so both implementations must agree
        exactly; this pins our 'intended semantics' reading to the reference
        where the reference is unambiguous."""
        ref = oracle.import_reference_criterions()
        rng = np.random.default_rng(5)
        e = np.sort(rng.uniform(size=(100,)).astype(np.float32))
        for ratio in (0.5, 0.7, 1.0):
            want = ref.ranking_loss(torch.from_numpy(e),
                                    penalize_ratio=ratio).item()
            from drawingspinup_tpu.train.losses import ranking_loss
            got = float(ranking_loss(jnp.asarray(e), penalize_ratio=ratio))
            assert abs(got - want) < 1e-6, (ratio, got, want)

    def test_ranking_loss_sum_with_weights_sorted(self):
        ref = oracle.import_reference_criterions()
        rng = np.random.default_rng(6)
        e = np.sort(rng.uniform(size=(64,)).astype(np.float32))
        w = rng.uniform(0.5, 2.0, size=(64,)).astype(np.float32)
        want = ref.ranking_loss(torch.from_numpy(e), penalize_ratio=0.8,
                                extra_weights=torch.from_numpy(w),
                                type="sum").item()
        from drawingspinup_tpu.train.losses import ranking_loss
        got = float(ranking_loss(jnp.asarray(e), penalize_ratio=0.8,
                                 extra_weights=jnp.asarray(w),
                                 reduction="sum"))
        assert abs(got - want) < 1e-5

    def test_ranking_loss_intended_semantics_unsorted(self):
        """Our implementation keeps the k smallest errors (the paper's
        intent); verified against a direct numpy computation on unsorted
        input, where the reference's index_select quirk diverges."""
        rng = np.random.default_rng(7)
        e = rng.uniform(size=(50,)).astype(np.float32)
        k = int(0.7 * 50)
        want = float(np.sort(e)[:k].mean())
        from drawingspinup_tpu.train.losses import ranking_loss
        got = float(ranking_loss(jnp.asarray(e), penalize_ratio=0.7))
        assert abs(got - want) < 1e-6


class TestNeusLossOracle:
    """Formula oracles for neus_ortho.py:106-151 written as direct torch
    expressions (the reference file itself needs pytorch-lightning to
    import)."""

    def test_eikonal(self):
        rng = np.random.default_rng(8)
        g = rng.standard_normal((128, 3)).astype(np.float32)
        tg = torch.from_numpy(g)
        # neus_ortho.py:123
        want = ((torch.linalg.norm(tg, ord=2, dim=-1) - 1.0) ** 2).mean().item()
        from drawingspinup_tpu.train.losses import eikonal_loss
        got = float(eikonal_loss(jnp.asarray(g)))
        assert abs(got - want) < 1e-5

    def test_sparsity(self):
        rng = np.random.default_rng(9)
        s = rng.standard_normal((256,)).astype(np.float32) * 0.05
        # neus_ortho.py:135 with sparsity_scale=100
        want = torch.exp(-100.0 * torch.from_numpy(s).abs()).mean().item()
        from drawingspinup_tpu.train.losses import sparsity_loss
        got = float(sparsity_loss(jnp.asarray(s), scale=100.0))
        assert abs(got - want) < 1e-5

    def test_normal_smooth(self):
        rng = np.random.default_rng(10)
        a = rng.standard_normal((64, 3)).astype(np.float32)
        b = a + rng.standard_normal((64, 3)).astype(np.float32) * 0.01
        # neus_ortho.py:149
        want = (torch.from_numpy(a) - torch.from_numpy(b)).abs().mean().item()
        from drawingspinup_tpu.train.losses import normal_smooth_loss
        got = float(normal_smooth_loss(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - want) < 1e-6

    def test_geo_aware_normal_error_weighting(self):
        """neus_ortho.py:106-108: errors scaled by exp|cos| normalized over
        the batch, then rank-kept with view weights, summed."""
        rng = np.random.default_rng(11)
        n_pred = rng.standard_normal((40, 3)).astype(np.float32)
        n_gt = rng.standard_normal((40, 3)).astype(np.float32)
        cosines = rng.uniform(-1, 1, size=(40,)).astype(np.float32)
        vw = rng.uniform(0.5, 2.0, size=(40,)).astype(np.float32)

        tp, tg = torch.from_numpy(n_pred), torch.from_numpy(n_gt)
        errs = 1 - torch.nn.functional.cosine_similarity(tp, tg, dim=1)
        w = torch.exp(torch.from_numpy(cosines).abs())
        errs = errs * w / w.sum()
        # intended ranking semantics (sorted selection), type='sum'
        order = torch.argsort(errs)
        k = int(0.9 * errs.shape[0])
        want = (errs[order[:k]] * torch.from_numpy(vw)[order[:k]]).sum().item()

        from drawingspinup_tpu.train.losses import (cosine_similarity,
                                                    ranking_loss)
        e = 1 - cosine_similarity(jnp.asarray(n_pred), jnp.asarray(n_gt))
        wj = jnp.exp(jnp.abs(jnp.asarray(cosines)))
        e = e * wj / jnp.sum(wj)
        got = float(ranking_loss(e, penalize_ratio=0.9,
                                 extra_weights=jnp.asarray(vw),
                                 reduction="sum"))
        assert abs(got - want) < 1e-6


class TestGlobalGeneratorParity:
    """pix2pixHD GlobalGenerator (the lama-regular.yaml backbone,
    pix2pixhd.py:341-436) — importable offline (torch-only imports)."""

    def _ref(self):
        oracle._stub_kornia()
        import sys
        if str(oracle.STAGE1) not in sys.path:
            sys.path.insert(0, str(oracle.STAGE1))
        from saicinpainting.training.modules import pix2pixhd as ref
        return ref

    def test_forward_parity(self):
        ref = self._ref()
        tm = ref.GlobalGenerator(input_nc=4, output_nc=1, ngf=16,
                                 n_downsampling=2, n_blocks=3,
                                 add_out_act="sigmoid")
        _randomize_(tm, seed=19)
        tm.eval()
        rng = np.random.default_rng(12)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.pix2pixhd import GlobalGenerator
        fm = GlobalGenerator(output_nc=1, ngf=16, n_downsampling=2,
                             n_blocks=3, out_act="sigmoid")
        variables = torch_port.convert_global_generator(
            _to_numpy_sd(tm), n_downsampling=2, n_blocks=3)
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-4, f"GlobalGenerator parity error {err}"

    def test_port_covers_all_torch_params(self):
        ref = self._ref()
        tm = ref.GlobalGenerator(input_nc=4, output_nc=1, ngf=16,
                                 n_downsampling=2, n_blocks=3)
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in torch_port.global_generator_key_map(2, 3)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestRICOffsetFieldParity:
    def test_sample_positions_match_reference_offsets(self, monkeypatch):
        """The rotation-invariant conv's sampling positions must equal the
        reference's deform_conv2d offset field (models.py:551-604
        generate_coordinates): absolute tap position = base + default 3×3
        tap + stored offset. Channels 8/9 are the (untouched) center tap."""
        m = oracle.import_reference_stage3_models()
        monkeypatch.setattr(torch.Tensor, "cuda", lambda self: self,
                            raising=False)
        H = W = 17
        coords = m.generate_coordinates(1, H, W)  # (1, 18, H, W)
        off = coords[0].detach().numpy().transpose(1, 2, 0)  # (H, W, 18)

        # channel pair → 3×3 kernel tap (row-major), per the reference's
        # deform_conv2d layout: pairs 0..3 are taps 0..3, pair (8,9) is the
        # center (tap 4), pairs 5..8 (ch 10..17) are taps 5..8
        base_r, base_c = np.mgrid[0:H, 0:W].astype(np.float64)
        default = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
                   (1, -1), (1, 0), (1, 1)]
        ref_pos = np.zeros((H, W, 9, 2))
        for tap in range(9):
            dr, dc = default[tap]
            ref_pos[:, :, tap, 0] = base_r + dr + off[:, :, 2 * tap]
            ref_pos[:, :, tap, 1] = base_c + dc + off[:, :, 2 * tap + 1]

        from drawingspinup_tpu.models.generator_j import ric_sample_positions
        ours = ric_sample_positions(H, W)
        err = np.abs(ours - ref_pos).max()
        assert err < 1e-3, f"RIC offset-field parity error {err}"


# ---------------------------------------------------------------------------
# pix2pixHD multidilated family (round-2b additions)
# ---------------------------------------------------------------------------

def _ref_pix2pixhd():
    oracle._stub_kornia()
    import sys
    if str(oracle.STAGE1) not in sys.path:
        sys.path.insert(0, str(oracle.STAGE1))
    from saicinpainting.training.modules import pix2pixhd as ref
    return ref


def _ref_mdconv():
    _ref_pix2pixhd()
    from saicinpainting.training.modules.multidilated_conv import (
        MultidilatedConv)
    return MultidilatedConv


class TestMultidilatedConvParity:
    """multidilated_conv.py:6-98 — the op itself, in the reference's two
    realizable comb modes."""

    def _run(self, tm, x_nchw, flax_mod):
        _randomize_(tm, seed=3)
        tm.eval()
        with torch.no_grad():
            want = tm(torch.from_numpy(x_nchw)).numpy()
        sd = _to_numpy_sd(tm)
        n = len([k for k in sd if k.endswith(".weight")])
        params = {}
        for j in range(n):
            params[f"kernel{j}"] = jnp.asarray(
                sd[f"convs.{j}.weight"].transpose(2, 3, 1, 0))
            params[f"bias{j}"] = jnp.asarray(sd[f"convs.{j}.bias"])
        got = flax_mod.apply({"params": params},
                             jnp.asarray(x_nchw.transpose(0, 2, 3, 1)))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape, (got.shape, want.shape)
        err = np.abs(got - want).max()
        assert err < 1e-5, f"MultidilatedConv parity error {err}"

    def test_sum_mode_reflect(self):
        """Default comb_mode='sum' with padding_mode=reflect — the exact
        configuration MultidilatedResnetBlock instantiates (:60-75)."""
        MD = _ref_mdconv()
        tm = MD(8, 8, kernel_size=3, padding_mode="reflect")
        from drawingspinup_tpu.models.pix2pixhd import MultiDilatedConv
        x = np.random.default_rng(0).standard_normal(
            (2, 8, 17, 17)).astype(np.float32)
        self._run(tm, x, MultiDilatedConv(8, 3, padding_mode="reflect"))

    def test_cat_out_mode_interleave(self):
        """comb_mode='cat_out' re-orders the concat by the interleave index
        (:15-18, :95-96) — output channel k cycles through the branches."""
        MD = _ref_mdconv()
        tm = MD(6, 9, kernel_size=3, comb_mode="cat_out", equal_dim=True)
        from drawingspinup_tpu.models.pix2pixhd import MultiDilatedConv
        x = np.random.default_rng(1).standard_normal(
            (1, 6, 13, 13)).astype(np.float32)
        self._run(tm, x, MultiDilatedConv(9, 3, comb_mode="cat_out"))

    def test_explicit_padding_list(self):
        """The per-branch padding list form (reference :53-56). The
        discriminator's own [2, 3] list is spatially INCONSISTENT for any
        dilation_num ≥ 2 (branch outputs differ in H/W and the reference
        crashes on sum/cat) — oracle the list plumbing with a consistent
        one: k=3 s=1, paddings [1, 2] against dilations [1, 2]."""
        MD = _ref_mdconv()
        tm = MD(8, 8, kernel_size=3, stride=1, padding=[1, 2],
                dilation_num=2)
        from drawingspinup_tpu.models.pix2pixhd import MultiDilatedConv
        x = np.random.default_rng(2).standard_normal(
            (1, 8, 16, 16)).astype(np.float32)
        self._run(tm, x, MultiDilatedConv(8, 3, stride=1, padding=(1, 2),
                                          dilation_num=2))


class TestMultiDilatedGlobalGeneratorParity:
    def test_forward_parity(self):
        ref = _ref_pix2pixhd()
        tm = ref.MultiDilatedGlobalGenerator(
            input_nc=4, output_nc=1, ngf=16, n_downsampling=2, n_blocks=2,
            add_out_act="sigmoid")
        _randomize_(tm, seed=23)
        tm.eval()
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.pix2pixhd import (
            MultiDilatedGlobalGenerator)
        fm = MultiDilatedGlobalGenerator(output_nc=1, ngf=16,
                                         n_downsampling=2, n_blocks=2,
                                         out_act="sigmoid")
        variables = torch_port.convert_multidilated_global_generator(
            _to_numpy_sd(tm), n_downsampling=2, n_blocks=2)
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-4, f"MultiDilatedGlobalGenerator parity error {err}"

    def test_port_covers_all_torch_params(self):
        ref = _ref_pix2pixhd()
        tm = ref.MultiDilatedGlobalGenerator(input_nc=4, output_nc=1, ngf=16,
                                             n_downsampling=2, n_blocks=2)
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in
                  torch_port.multidilated_global_generator_key_map(2, 2)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestConfigGlobalGeneratorParity:
    """The per-instance block SCHEDULE parser (pix2pixhd.py:239-326) against
    the reference, over a spec mixing all four block kinds. (The reference's
    use_default path hits an UnboundLocalError in make_and_add_blocks — a
    latent closure bug — so explicit specs are the only oracle-able form.)"""

    SPEC = (
        {"n_blocks": 1, "use_default": False,
         "resnet_block_kind": "resnetblock",
         "resnet_conv_kind": "default", "resnet_dilation": 1,
         "multidilation_kwargs": {}},
        {"n_blocks": 2, "use_default": False,
         "resnet_block_kind": "multidilatedresnetblock",
         "resnet_conv_kind": "multidilated", "resnet_dilation": 1,
         "multidilation_kwargs": {}},
        {"n_blocks": 1, "use_default": False,
         "resnet_block_kind": "resnetblock5x5",
         "resnet_conv_kind": "default", "resnet_dilation": 1,
         "multidilation_kwargs": {}},
        {"n_blocks": 1, "use_default": False,
         "resnet_block_kind": "resnetblockdwdil",
         "resnet_conv_kind": "default", "resnet_dilation": 2,
         "multidilation_kwargs": {}},
        {"n_blocks": 1, "use_default": False,
         "resnet_block_kind": "resnetblock",
         "resnet_conv_kind": "depthwise", "resnet_dilation": 1,
         "multidilation_kwargs": {}},
    )

    def _torch_model(self, ref):
        return ref.ConfigGlobalGenerator(
            input_nc=4, output_nc=1, ngf=16, n_downsampling=2,
            manual_block_spec=[dict(s) for s in self.SPEC],
            add_out_act="sigmoid")

    def test_forward_parity(self):
        ref = _ref_pix2pixhd()
        tm = self._torch_model(ref)
        _randomize_(tm, seed=29)
        tm.eval()
        rng = np.random.default_rng(6)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.pix2pixhd import ConfigGlobalGenerator
        fm = ConfigGlobalGenerator(output_nc=1, ngf=16, n_downsampling=2,
                                   manual_block_spec=self.SPEC,
                                   out_act="sigmoid")
        variables = torch_port.convert_config_global_generator(
            _to_numpy_sd(tm), n_downsampling=2,
            manual_block_spec=self.SPEC)
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-4, f"ConfigGlobalGenerator parity error {err}"

    def test_port_covers_all_torch_params(self):
        ref = _ref_pix2pixhd()
        tm = self._torch_model(ref)
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in torch_port.config_global_generator_key_map(
            2, self.SPEC)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestSuperChannelsGeneratorParity:
    SC = (8, 16, 32, 64, 64, 64, 128, 64, 96)

    def test_channel_schedule_matches_reference(self):
        ref = _ref_pix2pixhd()
        tm = ref.GlobalGeneratorFromSuperChannels(
            input_nc=4, output_nc=1, n_downsampling=3, n_blocks=6,
            super_channels=list(self.SC))
        from drawingspinup_tpu.models.pix2pixhd import convert_super_channels
        assert convert_super_channels(self.SC, 3) == list(tm.channels)

    def test_forward_parity(self):
        ref = _ref_pix2pixhd()
        tm = ref.GlobalGeneratorFromSuperChannels(
            input_nc=4, output_nc=1, n_downsampling=3, n_blocks=6,
            super_channels=list(self.SC))
        _randomize_(tm, seed=31)
        tm.eval()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        from drawingspinup_tpu.models.pix2pixhd import (
            GlobalGeneratorFromSuperChannels)
        fm = GlobalGeneratorFromSuperChannels(output_nc=1,
                                              super_channels=self.SC,
                                              n_downsampling=3, n_blocks=6)
        variables = torch_port.convert_superchannels_generator(
            _to_numpy_sd(tm), n_downsampling=3, n_blocks=6)
        got = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-4, f"SuperChannels generator parity error {err}"

    def test_port_covers_all_torch_params(self):
        ref = _ref_pix2pixhd()
        tm = ref.GlobalGeneratorFromSuperChannels(
            input_nc=4, output_nc=1, n_downsampling=3, n_blocks=6,
            super_channels=list(self.SC))
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in
                  torch_port.superchannels_generator_key_map(3, 6)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestPix2PixHDDiscriminatorParity:
    def test_nlayer_forward_parity(self):
        ref = _ref_pix2pixhd()
        tm = ref.NLayerDiscriminator(input_nc=4, ndf=16, n_layers=3)
        _randomize_(tm, seed=37)
        tm.eval()
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want_score, want_feats = tm(torch.from_numpy(x))

        from drawingspinup_tpu.models.pix2pixhd import NLayerDiscriminator
        fm = NLayerDiscriminator(ndf=16, n_layers=3)
        variables = torch_port.convert_nlayer_discriminator(
            _to_numpy_sd(tm), n_layers=3)
        score, feats = fm.apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=False)
        score = np.asarray(score).transpose(0, 3, 1, 2)
        assert score.shape == want_score.numpy().shape
        err = np.abs(score - want_score.numpy()).max()
        assert err < 1e-4, f"NLayerDiscriminator parity error {err}"
        assert len(feats) == len(want_feats)

    def test_multidilated_forward_parity(self):
        ref = _ref_pix2pixhd()
        # dilation_num=1 is the ONLY runnable configuration of the reference
        # class: its hard-coded padding=[2, 3] makes branch outputs spatially
        # inconsistent for every dilation_num >= 2 (RuntimeError on sum)
        tm = ref.MultidilatedNLayerDiscriminator(
            input_nc=4, ndf=16, n_layers=3,
            multidilation_kwargs={"dilation_num": 1})
        _randomize_(tm, seed=41)
        tm.eval()
        rng = np.random.default_rng(9)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want_score, _ = tm(torch.from_numpy(x))

        from drawingspinup_tpu.models.pix2pixhd import (
            MultidilatedNLayerDiscriminator)
        fm = MultidilatedNLayerDiscriminator(ndf=16, n_layers=3,
                                             dilation_num=1)
        variables = torch_port.convert_nlayer_discriminator(
            _to_numpy_sd(tm), n_layers=3, middle_kind="multidilated",
            dilation_num=1)
        score, _ = fm.apply(variables,
                            jnp.asarray(x.transpose(0, 2, 3, 1)),
                            train=False)
        score = np.asarray(score).transpose(0, 3, 1, 2)
        assert score.shape == want_score.numpy().shape
        err = np.abs(score - want_score.numpy()).max()
        assert err < 1e-4, f"MultidilatedNLayerDiscriminator error {err}"


class TestFFCDiscriminatorParity:
    """FFCNLayerDiscriminator (ffc.py:369-432) with mixed local/global
    ratios (0 -> 0.5 init conv, 0.5/0.5 body) so the spectral branch is
    exercised too."""

    def test_forward_parity(self):
        ref_ffc = oracle.import_reference_ffc()
        tm = ref_ffc.FFCNLayerDiscriminator(
            input_nc=4, ndf=16, n_layers=3,
            init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0.5,
                                  enable_lfu=False),
            conv_kwargs=dict(ratio_gin=0.5, ratio_gout=0.5,
                             enable_lfu=False))
        _randomize_(tm, seed=43)
        tm.eval()
        rng = np.random.default_rng(11)
        x = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want_score, want_feats = tm(torch.from_numpy(x))

        from drawingspinup_tpu.models.ffc import FFCNLayerDiscriminator
        fm = FFCNLayerDiscriminator(ndf=16, n_layers=3,
                                    init_ratio_gin=0.0, init_ratio_gout=0.5,
                                    ratio_gin=0.5, ratio_gout=0.5,
                                    enable_lfu=False)
        variables = torch_port.convert_ffc_nlayer_discriminator(
            _to_numpy_sd(tm), n_layers=3)
        score, feats = fm.apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=False)
        score = np.asarray(score).transpose(0, 3, 1, 2)
        assert score.shape == want_score.numpy().shape
        err = np.abs(score - want_score.numpy()).max()
        assert err < 1e-3, f"FFCNLayerDiscriminator parity error {err}"
        assert len(feats) == len(want_feats)

    def test_port_covers_all_torch_params(self):
        ref_ffc = oracle.import_reference_ffc()
        tm = ref_ffc.FFCNLayerDiscriminator(
            input_nc=4, ndf=16, n_layers=3,
            init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0.5,
                                  enable_lfu=False),
            conv_kwargs=dict(ratio_gin=0.5, ratio_gout=0.5,
                             enable_lfu=False))
        sd_keys = {k for k in tm.state_dict()
                   if not k.endswith("num_batches_tracked")}
        mapped = {e[0] for e in
                  torch_port.ffc_nlayer_discriminator_key_map(3)}
        missing = sd_keys - mapped
        assert not missing, f"unmapped torch keys: {sorted(missing)[:10]}"


class TestVanillaMLPParity:
    """The SDF field's MLP (network_utils.py:94-138): sphere init + weight
    norm + softplus(β=100) — the geometry-critical module of stage 2b."""

    CFG = dict(n_neurons=64, n_hidden_layers=1, sphere_init=True,
               weight_norm=True, sphere_init_radius=0.5,
               output_activation="none")

    def test_forward_parity_with_ported_weights(self):
        nu = oracle.import_reference_network_utils()
        tm = nu.VanillaMLP(16, 13, dict(self.CFG))
        tm.eval()

        from drawingspinup_tpu.models.fields import (MLPConfig, apply_mlp)
        cfg = MLPConfig(n_neurons=64, n_hidden_layers=1, sphere_init=True,
                        weight_norm=True, output_activation=None)
        sd = _to_numpy_sd(tm)
        layers = []
        for idx in (0, 2):
            layers.append({
                "w": jnp.asarray(sd[f"layers.{idx}.weight_v"].T),
                "g": jnp.asarray(sd[f"layers.{idx}.weight_g"].reshape(-1)),
                "b": jnp.asarray(sd[f"layers.{idx}.bias"]),
            })
        params = {"layers": layers}

        rng = np.random.default_rng(4)
        x = rng.standard_normal((32, 16)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(apply_mlp(cfg, params, jnp.asarray(x)))
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-5, f"VanillaMLP parity error {err}"

    def test_sphere_init_statistics_match(self):
        """Our init_mlp reproduces the reference's sphere-init distribution:
        last layer ~N(sqrt(pi)/sqrt(din), 1e-4) with bias -radius; first
        layer zero beyond column 3 with N(0, sqrt(2)/sqrt(dout)) on xyz."""
        nu = oracle.import_reference_network_utils()
        torch.manual_seed(0)
        tm = nu.VanillaMLP(35, 13, dict(self.CFG))
        sd = _to_numpy_sd(tm)

        import jax
        from drawingspinup_tpu.models.fields import MLPConfig, init_mlp
        cfg = MLPConfig(n_neurons=64, n_hidden_layers=1, sphere_init=True,
                        weight_norm=True, output_activation=None)
        ours = init_mlp(cfg, 35, 13, jax.random.PRNGKey(0))

        # first layer: columns >=3 of v are exactly zero on both sides
        v0_ref = sd["layers.0.weight_v"]          # (64, 35)
        w0 = np.asarray(ours["layers"][0]["w"])   # (35, 64)
        assert np.all(v0_ref[:, 3:] == 0)
        assert np.all(w0[3:, :] == 0)
        assert abs(v0_ref[:, :3].std() - w0[:3, :].std()) < 0.05
        # last layer: tight normal around sqrt(pi)/sqrt(din), bias -radius
        vl_ref = sd["layers.2.weight_v"]
        wl = np.asarray(ours["layers"][1]["w"])
        want_mean = np.sqrt(np.pi) / np.sqrt(64)
        assert abs(vl_ref.mean() - want_mean) < 1e-3
        assert abs(wl.mean() - want_mean) < 1e-3
        assert vl_ref.std() < 2e-4 and wl.std() < 2e-4
        assert np.allclose(sd["layers.2.bias"], -0.5)
        assert np.allclose(np.asarray(ours["layers"][1]["b"]), -0.5)
        # weight-norm gains equal the column norms at init on both sides
        g_ref = sd["layers.0.weight_g"].reshape(-1)
        assert np.allclose(g_ref, np.linalg.norm(v0_ref, axis=1), atol=1e-5)
        g_ours = np.asarray(ours["layers"][0]["g"])
        assert np.allclose(g_ours, np.linalg.norm(w0, axis=0), atol=1e-5)


class TestOrthoRayOracle:
    """Ortho ray generation (ray_utils.py:20-58) vs render/cameras.py."""

    def test_rays_match_reference(self):
        nu = oracle.import_reference_network_utils()  # ensures pkg stubs
        ru = oracle._import_file(
            "instant_nsr.models.ray_utils",
            oracle.STAGE2 / "instant_nsr" / "models" / "ray_utils.py")
        W = H = 17
        o_ref, d_ref = ru.get_ortho_ray_directions_origins(W, H)
        rng = np.random.default_rng(21)
        # a valid rotation + translation
        q = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
        c2w = np.concatenate([q, rng.standard_normal((3, 1)).astype(
            np.float32)], axis=1)  # (3, 4)
        c2w_t = torch.eye(4)
        c2w_t[:3] = torch.from_numpy(c2w)
        ro_ref, rd_ref = ru.get_ortho_rays(o_ref, d_ref,
                                           c2w_t, keepdim=True)

        from drawingspinup_tpu.render.cameras import (ortho_ray_grid,
                                                      rays_to_world)
        o, d = ortho_ray_grid(W, H)
        assert np.abs(o - o_ref.numpy()).max() < 1e-6
        assert np.abs(d - d_ref.numpy()).max() < 1e-6
        ro, rd = rays_to_world(o, d, c2w[None, None])
        assert np.abs(ro - ro_ref.numpy()).max() < 1e-5
        assert np.abs(rd - rd_ref.numpy()).max() < 1e-5


class TestLRScheduleOracle:
    """The recon optimizer's LR trajectory vs the reference's own
    parse_scheduler composition (systems/utils.py:313-345 with
    neuralangelo-ortho-wmask.yaml:100-127 knobs: AdamW groups
    geometry 1e-3 / texture 1e-2 / variance 1e-3, ConstantLR(1.0, 500) →
    ExponentialLR(0.1^(1/2500)) at milestone 500, stepped per step)."""

    class _Cfg(dict):
        def __getattr__(self, k):
            v = self[k]
            return TestLRScheduleOracle._Cfg(v) if isinstance(v, dict) else v

    def test_lr_trajectory_matches(self):
        oracle.import_reference_network_utils()
        import instant_nsr.systems.utils as su

        lin = torch.nn.Linear(2, 2)
        groups = [
            {"params": [torch.nn.Parameter(torch.zeros(1))],
             "name": "geometry", "lr": 1e-3},
            {"params": [torch.nn.Parameter(torch.zeros(1))],
             "name": "texture", "lr": 1e-2},
            {"params": [torch.nn.Parameter(torch.zeros(1))],
             "name": "variance", "lr": 1e-3},
        ]
        optim = torch.optim.AdamW(groups, lr=0.01, betas=(0.9, 0.99),
                                  eps=1e-15)
        max_steps, constant_steps = 3000, 500
        gamma = 0.1 ** (1.0 / (max_steps - constant_steps))
        cfg = self._Cfg({
            "name": "SequentialLR", "interval": "step",
            "milestones": [constant_steps],
            "schedulers": [
                {"name": "ConstantLR",
                 "args": {"factor": 1.0, "total_iters": constant_steps}},
                {"name": "ExponentialLR", "args": {"gamma": gamma}},
            ],
        })
        # parse_scheduler recurses with dicts that need .name/.get/.args
        def _wrap(c):
            if isinstance(c, dict):
                return self._Cfg({k: ([_wrap(x) for x in v]
                                      if isinstance(v, list) else _wrap(v))
                                  for k, v in c.items()})
            return c
        sched = su.parse_scheduler(_wrap(dict(cfg)), optim)["scheduler"]

        probe = [0, 1, 250, 499, 500, 501, 1000, 2000, 2999]
        ref_lrs = {}
        for s in range(max_steps):
            if s in probe:
                ref_lrs[s] = [g["lr"] for g in optim.param_groups]
            optim.step()
            sched.step()

        from drawingspinup_tpu.train.nsr import NSRConfig, make_optimizer
        ncfg = NSRConfig()
        assert (ncfg.max_steps, ncfg.constant_steps) == (3000, 500)
        decay_steps = ncfg.max_steps - ncfg.constant_steps
        g2 = ncfg.lr_decay_target ** (1.0 / decay_steps)
        assert abs(g2 - gamma) < 1e-12

        def ours(base_lr, s):
            if s < ncfg.constant_steps:
                return base_lr
            return base_lr * g2 ** (s - ncfg.constant_steps)

        for s, lrs in ref_lrs.items():
            for base, got_ref in zip((ncfg.lr_geometry, ncfg.lr_texture,
                                      ncfg.lr_variance), lrs):
                want = ours(base, s)
                assert abs(want - got_ref) / max(got_ref, 1e-12) < 1e-6, (
                    f"step {s}: ours {want} vs reference {got_ref}")


class TestSingleImageDatasetOracle:
    """Stage-2a conditioning math vs the REAL SingleImageDataset
    (single_image_dataset.py:16-185) with the reference's own fixed-pose txt
    files: Δelevation/Δazimuth per view + task one-hots, assembled in the
    mv.py:70-75 layout (normals stack then colors stack)."""

    def test_camera_task_embeddings_match(self, monkeypatch):
        import sys
        stage2 = str(oracle.STAGE2)
        if stage2 not in sys.path:
            sys.path.insert(0, stage2)
        monkeypatch.chdir(stage2)  # fix_cam_pose_dir is relative
        from PIL import Image
        from mvdiffusion.data.single_image_dataset import SingleImageDataset

        rgba = np.zeros((64, 64, 4), np.uint8)
        rgba[16:48, 16:48] = (200, 64, 32, 255)
        ds = SingleImageDataset(num_views=6, img_wh=(256, 256),
                                bg_color="white", crop_size=-1,
                                single_image=Image.fromarray(rgba, "RGBA"))
        item = ds[0]
        cam = item["camera_embeddings"].numpy()            # (6, 3)
        nt = item["normal_task_embeddings"].numpy()        # (6, 2)
        ct = item["color_task_embeddings"].numpy()         # (6, 2)
        want = np.concatenate([
            np.concatenate([cam, nt], axis=-1),
            np.concatenate([cam, ct], axis=-1)], axis=0)   # (12, 5)

        from drawingspinup_tpu.pipelines.stage2_mv import (
            camera_task_embeddings)
        views = ["front", "front_right", "right", "back", "left",
                 "front_left"]
        got = camera_task_embeddings(views)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-5, f"camera/task embedding parity error {err}"

    def test_white_bg_compositing_matches(self, monkeypatch):
        import sys
        stage2 = str(oracle.STAGE2)
        if stage2 not in sys.path:
            sys.path.insert(0, stage2)
        monkeypatch.chdir(stage2)
        from PIL import Image
        from mvdiffusion.data.single_image_dataset import SingleImageDataset

        rng = np.random.default_rng(33)
        rgba = rng.integers(0, 255, (256, 256, 4), dtype=np.uint8)
        ds = SingleImageDataset(num_views=6, img_wh=(256, 256),
                                bg_color="white", crop_size=-1,
                                single_image=Image.fromarray(rgba, "RGBA"))
        want = ds[0]["imgs_in"][0].numpy().transpose(1, 2, 0)  # (H, W, 3)
        img = rgba.astype(np.float32) / 255.0
        ours = img[..., :3] * img[..., 3:4] + 1.0 * (1 - img[..., 3:4])
        assert np.abs(ours - want).max() < 1e-6


class TestTruncExpOracle:
    def test_forward_and_clamped_gradient(self):
        """trunc_exp (models/utils.py:52-67): exp forward, backward clamps
        the saved input at max=15 only."""
        oracle.import_reference_network_utils()
        mu = sys_modules_get("instant_nsr.models.utils")
        x_np = np.array([-30.0, -5.0, 0.0, 5.0, 14.9, 16.0, 40.0], np.float32)
        xt = torch.tensor(x_np, requires_grad=True)
        yt = mu.trunc_exp(xt)
        yt.backward(torch.ones_like(yt))
        import jax
        from drawingspinup_tpu.models.encodings import trunc_exp
        y = np.asarray(trunc_exp(jnp.asarray(x_np)))
        g = np.asarray(jax.grad(lambda v: jnp.sum(trunc_exp(v)))(
            jnp.asarray(x_np)))
        assert np.allclose(y, yt.detach().numpy(), rtol=1e-6)
        assert np.allclose(g, xt.grad.numpy(), rtol=1e-5), (g, xt.grad)


def sys_modules_get(name):
    import sys
    return sys.modules[name]


class TestVanillaFrequencyOracle:
    def test_encoding_and_mask_match(self):
        """VanillaFrequency (network_utils.py:13-36): band order, the
        [sin, cos] func interleave, and the cosine-annealed masking curve."""
        nu = oracle.import_reference_network_utils()
        tm = nu.VanillaFrequency(3, dict(n_frequencies=4, n_masking_step=6))
        rng = np.random.default_rng(44)
        x = rng.standard_normal((5, 3)).astype(np.float32)

        from drawingspinup_tpu.models.encodings import (vanilla_frequency,
                                                        frequency_mask)
        for step in (0, 1, 3, 5, 6, 99):
            tm.update_step(None, step)
            with torch.no_grad():
                want = tm(torch.from_numpy(x)).numpy()
            m = np.asarray(frequency_mask(4, jnp.asarray(step), 6))
            assert np.allclose(m, tm.mask.numpy(), atol=1e-6), step
            got = np.asarray(vanilla_frequency(jnp.asarray(x), 4,
                                               jnp.asarray(m)))
            # reference emits [sin f0, cos f0, sin f1, ...] per concat order
            assert got.shape == want.shape
            err = np.abs(got - want).max()
            assert err < 1e-5, f"step {step}: frequency PE error {err}"


class _AttnDouble(torch.nn.Module):
    """Faithful double of the diffusers ``Attention`` public API surface the
    reference processors touch (to_q/k/v bias-free, to_out [linear, dropout],
    head_to_batch_dim / batch_to_head_dim heads-major split,
    get_attention_scores = softmax(scale·qkᵀ)). The NOVEL math under test
    (view/domain K/V folds) executes from the reference's own source."""

    def __init__(self, dim, heads, seed):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.to_q = torch.nn.Linear(dim, dim, bias=False)
        self.to_k = torch.nn.Linear(dim, dim, bias=False)
        self.to_v = torch.nn.Linear(dim, dim, bias=False)
        self.to_out = torch.nn.ModuleList(
            [torch.nn.Linear(dim, dim), torch.nn.Dropout(0.0)])
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        self.spatial_norm = None
        self.group_norm = None
        self.norm_cross = False
        self.residual_connection = False
        self.rescale_output_factor = 1.0

    def prepare_attention_mask(self, mask, seq_len, batch):
        assert mask is None
        return None

    def head_to_batch_dim(self, x):
        b, s, c = x.shape
        d = c // self.heads
        return (x.reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
                .reshape(b * self.heads, s, d))

    def batch_to_head_dim(self, x):
        bh, s, d = x.shape
        b = bh // self.heads
        return (x.reshape(b, self.heads, s, d).permute(0, 2, 1, 3)
                .reshape(b, s, self.heads * d))

    def get_attention_scores(self, q, k, mask=None):
        assert mask is None
        return torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)


class TestMVAttentionProcessorOracle:
    """The stage-2a NOVEL attention math, executed from the reference's own
    transformer_mv2d.py source (ast-extracted; diffusers/xformers doubled at
    their stable public contracts) vs models/attention_mv.py's folds."""

    DIM, HEADS, B, V, S = 32, 4, 2, 3, 16

    def _ours(self, attn_double, x_nsc, kv_fold, num_views):
        from drawingspinup_tpu.models.attention_mv import Attention
        fm = Attention(heads=self.HEADS)
        sd = _to_numpy_sd(attn_double)
        params = {"params": {
            "to_q": {"kernel": jnp.asarray(sd["to_q.weight"].T)},
            "to_k": {"kernel": jnp.asarray(sd["to_k.weight"].T)},
            "to_v": {"kernel": jnp.asarray(sd["to_v.weight"].T)},
            "to_out": {"kernel": jnp.asarray(sd["to_out.0.weight"].T),
                       "bias": jnp.asarray(sd["to_out.0.bias"])},
        }}
        return np.asarray(fm.apply(params, jnp.asarray(x_nsc),
                                   kv_fold=kv_fold, num_views=num_views))

    def test_multiview_fold(self):
        procs = oracle.import_reference_mv_processors()
        attn = _AttnDouble(self.DIM, self.HEADS, seed=51)
        rng = np.random.default_rng(51)
        x = rng.standard_normal(
            (self.B * self.V, self.S, self.DIM)).astype(np.float32)
        with torch.no_grad():
            want = procs.MVAttnProcessor()(
                attn, torch.from_numpy(x), num_views=self.V,
                multiview_attention=True).numpy()
        got = self._ours(attn, x, "views", self.V)
        err = np.abs(got - want).max()
        assert err < 1e-4, f"MV fold parity error {err}"

    def test_sparse_multiview_fold(self):
        procs = oracle.import_reference_mv_processors()
        attn = _AttnDouble(self.DIM, self.HEADS, seed=52)
        rng = np.random.default_rng(52)
        x = rng.standard_normal(
            (self.B * self.V, self.S, self.DIM)).astype(np.float32)
        with torch.no_grad():
            want = procs.XFormersMVAttnProcessor()(
                attn, torch.from_numpy(x), num_views=self.V,
                multiview_attention=True, sparse_mv_attention=True).numpy()
        got = self._ours(attn, x, "views_sparse", self.V)
        err = np.abs(got - want).max()
        assert err < 1e-4, f"sparse MV fold parity error {err}"

    def test_joint_domain_fold(self):
        procs = oracle.import_reference_mv_processors()
        attn = _AttnDouble(self.DIM, self.HEADS, seed=53)
        rng = np.random.default_rng(53)
        x = rng.standard_normal(
            (2 * self.B * self.V, self.S, self.DIM)).astype(np.float32)
        with torch.no_grad():
            want = procs.JointAttnProcessor()(
                attn, torch.from_numpy(x), num_tasks=2).numpy()
        got = self._ours(attn, x, "domains", self.V)
        err = np.abs(got - want).max()
        assert err < 1e-4, f"joint domain fold parity error {err}"


class TestGeometryHelperOracles:
    def test_contract_to_unisphere(self):
        """geometry.py:18-30 both contraction branches vs models/hashgrid
        contract()."""
        gh = oracle.import_reference_geometry_helpers()
        rng = np.random.default_rng(61)
        radius = 1.0
        from drawingspinup_tpu.models.fields import contract
        # AABB on in-range points (our clip is a no-op there; the reference
        # relies on tcnn's internal clamp for out-of-range inputs)
        x_in = rng.uniform(-radius, radius, (256, 3)).astype(np.float32)
        want = gh.contract_to_unisphere(
            torch.from_numpy(x_in.copy()), radius,
            gh.ContractionType.AABB).numpy()
        got = np.asarray(contract(jnp.asarray(x_in), radius, kind="aabb"))
        assert np.abs(got - want).max() < 1e-6
        # unbounded sphere on arbitrary points
        x = rng.standard_normal((256, 3)).astype(np.float32) * 2.0
        want = gh.contract_to_unisphere(
            torch.from_numpy(x.copy()), radius,
            gh.ContractionType.UN_BOUNDED_SPHERE).numpy()
        got = np.asarray(contract(jnp.asarray(x), radius, kind="sphere"))
        err = np.abs(got - want).max()
        assert err < 1e-5, f"sphere contraction parity error {err}"

    def test_pca_shear(self):
        """mesh_utils.py:76-93 PCA shear (in-place on a copy) vs
        render/mesh_post.shear_transformation."""
        gh = oracle.import_reference_geometry_helpers()
        rng = np.random.default_rng(62)
        # a leaning ellipsoid point cloud
        v = rng.standard_normal((500, 3)).astype(np.float64)
        v[:, 2] += 0.7 * v[:, 1]
        ref_v = v.copy()
        gh.shear_transformation(ref_v)  # reference mutates in place
        from drawingspinup_tpu.render.mesh_post import shear_transformation
        got = shear_transformation(v.copy())
        err = np.abs(got - ref_v).max()
        assert err < 1e-8, f"shear parity error {err}"


class TestOrthoPoseOracle:
    """Recon camera matrices vs the reference's ACTUAL fixed-pose txt files
    (instant_nsr/datasets/fixed_poses — a pure orbit, distinct from the
    mvdiffusion nine_views set) through the reference's own
    RT_opengl2opencv/inv_RT (ortho.py:31-53)."""

    VIEWS = ["front", "front_right", "right", "back_right", "back",
             "back_left", "left", "front_left", "top"]

    def _ref_mats(self):
        oh = oracle.import_reference_ortho_helpers()
        pose_dir = oracle.STAGE2 / "instant_nsr" / "datasets" / "fixed_poses"
        w2cs, c2ws = [], []
        for v in self.VIEWS:
            rt = np.loadtxt(pose_dir / f"000_{v}_RT.txt")
            rt_cv = oh.RT_opengl2opencv(rt)
            w2cs.append(rt_cv)
            c2ws.append(oh.inv_RT(rt_cv))
        return np.stack(c2ws), np.stack(w2cs), oh

    def test_view_matrices_match_reference_txt(self):
        c2w_ref, w2c_ref, _ = self._ref_mats()
        from drawingspinup_tpu.render.cameras import view_matrices
        c2w, w2c = view_matrices(self.VIEWS)
        err_w = np.abs(w2c - w2c_ref).max()
        err_c = np.abs(c2w - c2w_ref).max()
        assert err_w < 1e-5, f"w2c parity error {err_w}"
        assert err_c < 1e-5, f"c2w parity error {err_c}"

    def test_world_normal_chain_matches(self):
        """mask-zeroed normals → opencv flip → front-system world rotation
        (load_a_prediction, ortho.py:64-87) vs the stage2_recon loader
        math."""
        c2w_ref, w2c_ref, oh = self._ref_mats()
        rng = np.random.default_rng(71)
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.float64)
        normal = oh.img2normal(img)
        normal_cv = oh.normal_opengl2opencv(normal)
        rt_front = np.loadtxt(oracle.STAGE2 / "instant_nsr" / "datasets" /
                              "fixed_poses" / "000_front_RT.txt")
        rt_front_cv = oh.RT_opengl2opencv(rt_front)
        want = oh.camNormal2worldNormal(oh.inv_RT(rt_front_cv)[:3, :3],
                                        normal_cv)

        from drawingspinup_tpu.render.cameras import (opengl_to_opencv,
                                                      w2c_opengl)
        front_w2c = opengl_to_opencv(w2c_opengl("front"))
        rot_front_c2w = front_w2c[:3, :3].T
        ours = ((img / 255.0) * 2 - 1) * np.array([1, -1, -1.0])
        ours = ours @ rot_front_c2w.T
        err = np.abs(ours - want).max()
        assert err < 1e-5, f"world-normal chain parity error {err}"


class TestContractGradientSafety:
    def test_sphere_gradient_finite_at_center(self):
        """grad through contract(kind='sphere') must be finite at the
        contraction center (y=0) — a bare norm VJP leaks NaN through the
        untaken where-branch."""
        import jax
        from drawingspinup_tpu.models.fields import contract
        x = jnp.zeros((4, 3))
        g = jax.grad(lambda v: jnp.sum(contract(v, 1.0, kind="sphere")))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestNeuSAlphaOracle:
    """The NeuS section-alpha math (neus.py:12-40 VarianceNetwork inv_s and
    :90-112 get_alpha) executed from the reference's own class source, across
    anneal ratios, vs render/neus.neus_alpha."""

    class _Cfg(dict):
        def __getattr__(self, k):
            return self[k]

    def test_alpha_matches_reference(self):
        na = oracle.import_reference_neus_alpha()
        cfg = self._Cfg(init_val=0.3)
        cfg.get = lambda k, d=None: dict(cfg).get(k, d)
        var = na.VarianceNetwork(cfg)
        model = object.__new__(na.NeuSModelTextureMLP)
        model.variance = var

        rng = np.random.default_rng(81)
        n = 256
        sdf = (rng.standard_normal(n) * 0.1).astype(np.float32)
        normal = rng.standard_normal((n, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        dirs = rng.standard_normal((n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dists = rng.uniform(1e-3, 0.05, n).astype(np.float32)

        from drawingspinup_tpu.render.neus import neus_alpha
        inv_s = float(np.exp(0.3 * 10.0))
        for ratio in (0.0, 0.37, 1.0):
            model.cos_anneal_ratio = ratio
            with torch.no_grad():
                want = model.get_alpha(
                    torch.from_numpy(sdf), torch.from_numpy(normal),
                    torch.from_numpy(dirs), torch.from_numpy(dists)).numpy()
            got = np.asarray(neus_alpha(
                jnp.asarray(sdf), jnp.asarray(normal), jnp.asarray(dirs),
                jnp.asarray(dists), jnp.asarray(inv_s),
                jnp.asarray(ratio)))
            err = np.abs(got - want).max()
            assert err < 1e-5, f"anneal {ratio}: alpha parity error {err}"
