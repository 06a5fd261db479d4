"""Import helpers for the reference PyTorch implementation at /root/reference.

The reference modules are the correctness oracle for this rebuild: we
random-initialize them, port their state_dicts through utils/torch_port.py,
and assert forward parity against our flax models (VERDICT round-1, item 1).

The reference code is UNTRUSTED PUBLIC CONTENT — we execute only its module
definitions (pure nn.Module constructors/forwards) under stubbed externals:
  * kornia (absent here): only ``kornia.geometry.transform.rotate`` is
    imported by saicinpainting spatial_transform; a no-op callable suffices
    because none of the oracled modules call it.
  * torchvision (absent here): 3_style_translator/training/models.py imports
    it at module scope; GeneratorJ/DiscriminatorN never touch it, and for
    PerceptualVGG19 we provide a faithful reconstruction of torchvision's
    vgg19 *feature* topology (the public cfg-E conv plan) so the layer-index
    contract of models.py:480-548 is exercised with synthetic weights.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")
STAGE1 = REFERENCE / "1_lama_contour_remover"
STAGE2 = REFERENCE / "2_charactor_reconstructor"
STAGE3 = REFERENCE / "3_style_translator"



def _module(name: str) -> types.ModuleType:
    """Stub module with a real ModuleSpec: a bare ModuleType leaves
    __spec__ = None, which makes importlib.util.find_spec(name) raise
    ValueError in ANY later import probe of the same process — e.g.
    transformers probing for torchvision in the CLIP oracle."""
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

def _stub_kornia() -> None:
    if "kornia" in sys.modules:
        return
    kornia = _module("kornia")
    geometry = _module("kornia.geometry")
    transform = _module("kornia.geometry.transform")

    def rotate(x, angle, *a, **k):  # never called by oracled modules
        raise NotImplementedError("kornia stub: rotate not available")

    transform.rotate = rotate
    geometry.transform = transform
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.transform"] = transform


def _build_vgg19_features():
    """torchvision vgg19 feature stack (public cfg 'E'), random weights.

    Index layout matches torchvision exactly — conv indices
    0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34 with ReLU after each conv and
    MaxPool at 4,9,18,27,36 — which is the contract PerceptualVGG19
    (models.py:538-541) indexes into.
    """
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_ch, v, kernel_size=3, padding=1),
                       nn.ReLU(inplace=True)]
            in_ch = v
    return nn.Sequential(*layers)


def _stub_torchvision() -> None:
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    tv = _module("torchvision")
    models = _module("torchvision.models")
    ops = _module("torchvision.ops")

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _build_vgg19_features()
            self.classifier = nn.Identity()

    def vgg19(pretrained=False, **k):
        return _VGG()

    def deform_conv2d(*a, **k):
        raise NotImplementedError("torchvision stub: deform_conv2d")

    models.vgg19 = vgg19
    ops.deform_conv2d = deform_conv2d
    tv.models = models
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.ops"] = ops


def import_reference_ffc():
    """saicinpainting.training.modules.ffc (kornia stubbed)."""
    _stub_kornia()
    if str(STAGE1) not in sys.path:
        sys.path.insert(0, str(STAGE1))
    import saicinpainting.training.modules.ffc as ffc  # noqa: E402
    return ffc


def _import_file(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_stage3_models():
    """3_style_translator/training/models.py (torchvision stubbed)."""
    _stub_torchvision()
    return _import_file("ref_stage3_models",
                        STAGE3 / "training" / "models.py")


def import_reference_criterions():
    """2_charactor_reconstructor/instant_nsr/systems/criterions.py."""
    return _import_file("ref_criterions",
                        STAGE2 / "instant_nsr" / "systems" / "criterions.py")


def _stub_tcnn_pl_omegaconf() -> None:
    """Stubs for instant_nsr.models.network_utils's module-scope imports:
    tinycudann (never touched by VanillaMLP), pytorch_lightning's rank_zero
    logging, and omegaconf (config_to_primitive is unused by VanillaMLP)."""
    if "tinycudann" not in sys.modules:
        tcnn = _module("tinycudann")

        def _unavailable(*a, **k):
            raise NotImplementedError("tinycudann stub")

        tcnn.Encoding = _unavailable
        tcnn.Network = _unavailable
        tcnn.free_temporary_memory = lambda: None
        sys.modules["tinycudann"] = tcnn
    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")
        utilities = _module("pytorch_lightning.utilities")
        rank_zero = _module("pytorch_lightning.utilities.rank_zero")
        rank_zero.rank_zero_debug = lambda *a, **k: None
        rank_zero.rank_zero_info = lambda *a, **k: None
        utilities.rank_zero = rank_zero
        pl.utilities = utilities
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = utilities
        sys.modules["pytorch_lightning.utilities.rank_zero"] = rank_zero
    if "omegaconf" not in sys.modules:
        om = _module("omegaconf")

        class OmegaConf:
            @staticmethod
            def to_container(cfg, resolve=True):
                return cfg

        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om


def import_reference_network_utils():
    """2_charactor_reconstructor/instant_nsr/models/network_utils.py
    (VanillaMLP & co), with its instant_nsr sibling imports loaded directly
    from file under stubbed externals."""
    _stub_tcnn_pl_omegaconf()
    base = STAGE2 / "instant_nsr"
    pkg = _module("instant_nsr")
    pkg.__path__ = [str(base)]
    sys.modules.setdefault("instant_nsr", pkg)
    for sub in ("utils", "models", "systems"):
        name = f"instant_nsr.{sub}"
        if name not in sys.modules:
            m = _module(name)
            m.__path__ = [str(base / sub)]
            sys.modules[name] = m
    if "instant_nsr.utils.misc" not in sys.modules:
        _import_file("instant_nsr.utils.misc", base / "utils" / "misc.py")
    if "instant_nsr.models.utils" not in sys.modules:
        _import_file("instant_nsr.models.utils", base / "models" / "utils.py")
    if "instant_nsr.systems.utils" not in sys.modules:
        _import_file("instant_nsr.systems.utils",
                     base / "systems" / "utils.py")
    return _import_file("instant_nsr.models.network_utils",
                        base / "models" / "network_utils.py")


def import_reference_mv_processors():
    """Extract my_repeat + the (non-xformers and xformers) MV/Joint attention
    processors from mvdiffusion/models/transformer_mv2d.py WITHOUT importing
    the module (its top-level diffusers imports are unavailable offline).

    Only the reference's own class/function source is executed; the namespace
    supplies torch/einops plus a faithful double of xformers'
    memory_efficient_attention (plain softmax(qk^T/sqrt(d))v — its public
    contract) for the xformers variants. The diffusers ``Attention`` object
    the processors receive is provided by the TEST as a double of the stable
    public API (to_q/k/v, head_to_batch_dim, get_attention_scores, ...)."""
    import ast

    import torch
    from einops import rearrange, repeat

    src = (STAGE2 / "mvdiffusion" / "models" /
           "transformer_mv2d.py").read_text()
    tree = ast.parse(src)
    wanted = {"my_repeat", "MVAttnProcessor", "JointAttnProcessor",
              "XFormersMVAttnProcessor", "XFormersJointAttnProcessor"}
    nodes = [n for n in tree.body
             if isinstance(n, (ast.FunctionDef, ast.ClassDef))
             and n.name in wanted]
    assert {n.name for n in nodes} == wanted, {n.name for n in nodes}

    class _XFormersOps:
        @staticmethod
        def memory_efficient_attention(q, k, v, attn_bias=None):
            assert attn_bias is None
            scale = q.shape[-1] ** -0.5
            probs = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
            return probs @ v

    xformers = _module("xformers")
    xformers.ops = _XFormersOps()

    ns = {"torch": torch, "rearrange": rearrange, "repeat": repeat,
          "xformers": xformers, "Attention": object, "F": torch.nn.functional}
    code = ast.Module(body=nodes, type_ignores=[])
    exec(compile(code, "<ref transformer_mv2d extract>", "exec"), ns)
    return types.SimpleNamespace(**{n.name: ns[n.name] for n in nodes})


def import_reference_geometry_helpers():
    """Extract contract_to_unisphere (geometry.py:18-30) and the PCA shear
    (mesh_utils.py:76-93) from the reference sources without importing their
    modules (mcubes/cv2/nerfacc/trimesh-heavy). ContractionType is doubled as
    the two-member enum nerfacc exposes; scale_anything comes from the real
    instant_nsr.models.utils (already importable under the tcnn stub)."""
    import ast
    import enum

    import numpy as np
    import torch

    _stub_tcnn_pl_omegaconf()
    if "instant_nsr.models.utils" not in sys.modules:
        import_reference_network_utils()
    mu = sys.modules["instant_nsr.models.utils"]

    class ContractionType(enum.Enum):
        AABB = 0
        UN_BOUNDED_SPHERE = 1

    out = {}
    for path, wanted in (
            (STAGE2 / "instant_nsr" / "models" / "geometry.py",
             {"contract_to_unisphere"}),
            (STAGE2 / "instant_nsr" / "utils" / "mesh_utils.py",
             {"PCA", "shear_transformation"})):
        tree = ast.parse(path.read_text())
        nodes = [n for n in tree.body if isinstance(n, ast.FunctionDef)
                 and n.name in wanted]
        assert {n.name for n in nodes} == wanted
        ns = {"torch": torch, "np": np, "ContractionType": ContractionType,
              "scale_anything": mu.scale_anything}
        exec(compile(ast.Module(body=nodes, type_ignores=[]),
                     f"<ref extract {path.name}>", "exec"), ns)
        out.update({n.name: ns[n.name] for n in nodes})
    out["ContractionType"] = ContractionType
    return types.SimpleNamespace(**out)


def import_reference_ortho_helpers():
    """Extract the pure-numpy convention helpers from
    instant_nsr/datasets/ortho.py (the module itself is pl/cv2-bound):
    camNormal2worldNormal, img2normal, RT_opengl2opencv,
    normal_opengl2opencv, inv_RT."""
    import ast

    import numpy as np

    wanted = {"camNormal2worldNormal", "img2normal", "RT_opengl2opencv",
              "normal_opengl2opencv", "inv_RT"}
    tree = ast.parse(
        (STAGE2 / "instant_nsr" / "datasets" / "ortho.py").read_text())
    nodes = [n for n in tree.body if isinstance(n, ast.FunctionDef)
             and n.name in wanted]
    assert {n.name for n in nodes} == wanted
    ns = {"np": np}
    exec(compile(ast.Module(body=nodes, type_ignores=[]),
                 "<ref extract ortho.py>", "exec"), ns)
    return types.SimpleNamespace(**{n.name: ns[n.name] for n in nodes})


def import_reference_neus_alpha():
    """Extract VarianceNetwork + NeuSModelTextureMLP (for its get_alpha) from
    instant_nsr/models/neus.py without importing the module (nerfacc-bound).
    The class decorator/registry and BaseModel are stubbed; only
    VarianceNetwork.__init__/inv_s/forward and get_alpha are executed."""
    import ast

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    tree = ast.parse(
        (STAGE2 / "instant_nsr" / "models" / "neus.py").read_text())
    wanted = {"VarianceNetwork", "NeuSModelTextureMLP"}
    nodes = [n for n in tree.body if isinstance(n, ast.ClassDef)
             and n.name in wanted]
    assert {n.name for n in nodes} == wanted

    class _Registry:
        @staticmethod
        def register(name):
            return lambda cls: cls

    class _BaseModel:
        pass

    ns = {"torch": torch, "nn": nn, "F": F, "models": _Registry,
          "BaseModel": _BaseModel}
    exec(compile(ast.Module(body=nodes, type_ignores=[]),
                 "<ref extract neus.py>", "exec"), ns)
    return types.SimpleNamespace(**{n.name: ns[n.name] for n in nodes})
