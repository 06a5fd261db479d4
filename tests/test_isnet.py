"""ISNet (DIS background removal) tests: forward shapes, predict wrapper,
and the torch-state porter (round-trip through a synthetic state_dict with
the official key layout)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu.models.isnet import (
    ISNetDIS, isnet_predict, port_isnet_torch_state,
)


@pytest.fixture(scope="module")
def tiny_vars():
    model = ISNetDIS()
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


class TestISNet:
    def test_side_outputs(self, tiny_vars):
        model = ISNetDIS()
        x = jnp.asarray(np.random.default_rng(0)
                        .random((1, 64, 64, 3), np.float32))
        sides = model.apply(tiny_vars, x)
        assert len(sides) == 6
        for d in sides:
            assert d.shape == (1, 64, 64, 1)
            v = np.asarray(d)
            assert v.min() >= 0.0 and v.max() <= 1.0  # sigmoid

    def test_odd_size_pooling(self, tiny_vars):
        """ceil-mode pooling: non-power-of-two inputs round-trip."""
        model = ISNetDIS()
        x = jnp.zeros((1, 96, 96, 3))
        sides = model.apply(tiny_vars, x)
        assert sides[0].shape == (1, 96, 96, 1)

    def test_predict_wrapper(self, tiny_vars):
        img = (np.random.default_rng(1).random((64, 64, 3)) * 255)
        m = isnet_predict(tiny_vars, img)
        assert m.shape == (64, 64)
        assert 0.0 <= m.min() and m.max() <= 1.0

    def test_torch_porter_roundtrip(self, tiny_vars):
        """Build a torch-layout state_dict carrying our own values and check
        the porter reproduces the variables tree exactly (mapping coverage
        + transposes)."""
        from flax.traverse_util import flatten_dict

        from drawingspinup_tpu.models.isnet import _src_names

        state = {}
        for coll in ("params", "batch_stats"):
            for path, val in flatten_dict(tiny_vars[coll]).items():
                v = np.asarray(val)
                if path[-2].startswith("side"):
                    src = path[-2] + {"kernel": ".weight",
                                      "bias": ".bias"}[path[-1]]
                    if path[-1] == "kernel":
                        v = np.transpose(v, (3, 2, 0, 1))  # HWIO → OIHW
                else:
                    suffix = {"kernel": ".weight", "scale": ".weight",
                              "bias": ".bias", "mean": ".running_mean",
                              "var": ".running_var"}[path[-1]]
                    src = _src_names(path) + suffix
                    if path[-1] == "kernel":
                        v = np.transpose(v, (3, 2, 0, 1))
                state[src] = v
        ported = port_isnet_torch_state(state, tiny_vars)
        for coll in ("params", "batch_stats"):
            a = flatten_dict(tiny_vars[coll])
            b = flatten_dict(ported[coll])
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=str(k))

    def test_porter_rejects_unmapped(self, tiny_vars):
        with pytest.raises(KeyError):
            port_isnet_torch_state({"bogus.weight": np.zeros(1)}, tiny_vars)
