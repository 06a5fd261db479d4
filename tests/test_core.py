import json
import os

import numpy as np
import pytest

from drawingspinup_tpu.core import (
    Config, UidPaths, VIEWS, config_from_dict, load_uid_list,
)
from drawingspinup_tpu.core import io as dio
from drawingspinup_tpu.core.config import load_config


class TestConfig:
    def test_attr_access(self):
        c = Config({"a": {"b": 1}, "l": [1, {"x": 2}]})
        assert c.a.b == 1
        assert c.l[1].x == 2
        c.a.b = 5
        assert c["a"]["b"] == 5

    def test_interpolation(self):
        c = config_from_dict({
            "model": {"radius": 1.5, "r2": "${model.radius}"},
            "txt": "radius is ${model.radius}",
        })
        assert c.model.r2 == 1.5
        assert c.txt == "radius is 1.5"

    def test_resolvers(self):
        # mirrors the reference scheduler gamma computation (recon.py:13-15)
        c = config_from_dict({
            "trainer": {"max_steps": 3000},
            "constant": 500,
            "gamma": "${calc_exp_lr_decay_rate:0.1,${sub:${trainer.max_steps},${constant}}}",
            "feat": "${add:13,3}",
        })
        assert c.feat == 16
        assert abs(c.gamma - 0.1 ** (1 / 2500)) < 1e-12

    def test_load_with_overrides(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("model:\n  lr: 0.01\n  steps: 3000\n")
        c = load_config(str(p), overrides=["model.lr=0.5", "model.new=hi"])
        assert c.model.lr == 0.5
        assert c.model.new == "hi"
        assert c.model.steps == 3000

    def test_circular_raises(self):
        with pytest.raises(ValueError):
            config_from_dict({"a": "${b}", "b": "${a}"})


class TestContract:
    def test_paths(self):
        p = UidPaths("/data", "uid1")
        assert p.texture.endswith("uid1/char/texture.png")
        assert p.mv("color", "front").endswith("uid1/mv/color/front.png")
        assert p.mesh_obj() .endswith("mesh/it3000-mc512-f50000_c_r_s_cbp.obj")
        assert p.mesh_obj(thinned=True).endswith("_c_r_t_s_cbp.obj")
        assert p.frame("run", "color", 3).endswith("run/color/0003.png")
        assert len(VIEWS) == 6

    def test_uid_list(self, tmp_path):
        f = tmp_path / "uids.json"
        f.write_text(json.dumps(["a", "b"]))
        assert load_uid_list(str(f)) == ["a", "b"]


class TestIO:
    def test_image_roundtrip(self, tmp_path, rng):
        img = rng.random((16, 16, 3)).astype(np.float32)
        path = str(tmp_path / "x.png")
        dio.write_image(path, img)
        back = dio.read_image(path)
        assert back.shape == (16, 16, 3)
        assert np.abs(back - img).max() < 1 / 255 + 1e-6

    def test_rgba_and_gray(self, tmp_path, rng):
        rgba = rng.random((8, 8, 4)).astype(np.float32)
        p = str(tmp_path / "a.png")
        dio.write_image(p, rgba)
        assert dio.read_image(p).shape == (8, 8, 4)
        gray = rng.random((8, 8, 1)).astype(np.float32)
        p2 = str(tmp_path / "g.png")
        dio.write_image(p2, gray)
        assert dio.read_image(p2).shape == (8, 8, 1)

    def test_obj_roundtrip(self, tmp_path):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
        path = str(tmp_path / "m.obj")
        dio.write_obj(path, v, f, vertex_colors=c)
        v2, f2, c2 = dio.read_obj(path)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(f2, f)
        np.testing.assert_allclose(c2, c, atol=1e-5)

    def test_gif(self, tmp_path, rng):
        frames = [rng.random((8, 8, 3)).astype(np.float32) for _ in range(3)]
        p = str(tmp_path / "g.gif")
        dio.write_gif(p, frames)
        assert os.path.getsize(p) > 0
