"""FFC model family tests: shapes, ranges, and numerical parity of the
conv/spectral primitives against torch CPU oracles (torch is used ONLY as a
test oracle, never in the product code)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu.models.ffc import (
    BatchNorm, FFCNLayerDiscriminator, FFCResNetGenerator, FourierUnit,
)
from drawingspinup_tpu.ops.conv import conv2d, conv_transpose2d_torch


class TestConvPrimitives:
    def test_conv2d_reflect_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
        w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
        out = conv2d(jnp.asarray(x), jnp.asarray(w), padding=1,
                     pad_mode="reflect")
        tconv = torch.nn.Conv2d(5, 7, 3, padding=1, padding_mode="reflect",
                                bias=False)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
            tout = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(out),
                                   tout.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4)

    def test_conv2d_stride2(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
        out = conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1,
                     pad_mode="reflect")
        tconv = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1,
                                padding_mode="reflect", bias=False)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
            tout = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        assert out.shape == (1, 8, 8, 8)
        np.testing.assert_allclose(np.asarray(out),
                                   tout.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4)

    def test_conv_transpose_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
        # torch ConvT weight layout: (in, out, kh, kw); ours: HWIO (kh,kw,in,out)
        wt = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
        w = wt.transpose(2, 3, 0, 1)  # → (kh, kw, in, out)
        b = rng.standard_normal((3,)).astype(np.float32)
        out = conv_transpose2d_torch(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), stride=2, padding=1,
                                     output_padding=1)
        tconv = torch.nn.ConvTranspose2d(6, 3, 3, stride=2, padding=1,
                                         output_padding=1)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(wt))
            tconv.bias.copy_(torch.from_numpy(b))
            tout = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        assert out.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(np.asarray(out),
                                   tout.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4)


class TestFourierUnit:
    def test_fft_conv_matches_torch_math(self, rng):
        """FourierUnit forward vs a torch oracle of the same math
        (rfft2 → interleaved-channel 1×1 conv → BN(eval) → relu → irfft2)."""
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        fu = FourierUnit(features=4)
        params = fu.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(params["params"]["conv"]["kernel"])  # (1,1,8,8)
        scale = np.asarray(params["params"]["bn"]["BatchNorm_0"]["scale"])
        bias = np.asarray(params["params"]["bn"]["BatchNorm_0"]["bias"])
        out = fu.apply(params, jnp.asarray(x))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ft = torch.fft.rfftn(xt, dim=(-2, -1), norm="ortho")
        ft = torch.stack((ft.real, ft.imag), dim=-1)
        ft = ft.permute(0, 1, 4, 2, 3).contiguous().view(1, -1, 8, 5)
        wt = torch.from_numpy(w[0, 0].T[:, :, None, None])  # OIHW
        ft = torch.nn.functional.conv2d(ft, wt)
        # eval-mode BN with zero running mean / unit var
        ft = ft * torch.from_numpy(scale)[None, :, None, None] \
            + torch.from_numpy(bias)[None, :, None, None]
        ft = torch.relu(ft)
        ft = ft.view(1, 4, 2, 8, 5).permute(0, 1, 3, 4, 2).contiguous()
        ft = torch.complex(ft[..., 0], ft[..., 1])
        yt = torch.fft.irfftn(ft, s=(8, 8), dim=(-2, -1), norm="ortho")
        np.testing.assert_allclose(np.asarray(out),
                                   yt.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-3)


class TestGenerator:
    def test_lama_fourier_shapes(self, rng):
        """lama-fourier config: 4ch in, 1ch sigmoid out, resnet ratio 0.75."""
        gen = FFCResNetGenerator(output_nc=1, ngf=16, n_downsampling=3,
                                 n_blocks=2, resnet_ratio=0.75,
                                 enable_lfu=False, add_out_act="sigmoid")
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), x)
        y = gen.apply(params, x)
        assert y.shape == (1, 64, 64, 1)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_jit_and_grad(self, rng):
        gen = FFCResNetGenerator(output_nc=1, ngf=8, n_downsampling=2,
                                 n_blocks=1, resnet_ratio=0.75,
                                 enable_lfu=False)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        variables = gen.init(jax.random.PRNGKey(0), x)
        batch_stats = variables.get("batch_stats", {})

        @jax.jit
        def loss_fn(p, x):
            return jnp.mean(
                gen.apply({"params": p, "batch_stats": batch_stats}, x) ** 2)

        # grads through the FFT path must be finite
        grads = jax.grad(loss_fn)(variables["params"], x)
        leaves = jax.tree_util.tree_leaves(grads)
        assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)

    def test_lfu_path(self, rng):
        gen = FFCResNetGenerator(output_nc=1, ngf=8, n_downsampling=2,
                                 n_blocks=1, resnet_ratio=0.5, enable_lfu=True)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), x)
        y = gen.apply(params, x)
        assert y.shape == (1, 32, 32, 1)


class TestDiscriminator:
    def test_shapes_and_feats(self, rng):
        disc = FFCNLayerDiscriminator(ndf=8, n_layers=3)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        params = disc.init(jax.random.PRNGKey(0), x)
        score, feats = disc.apply(params, x)
        assert score.shape[0] == 2 and score.shape[-1] == 1
        assert len(feats) == 4  # n_layers + 1 intermediate activations
