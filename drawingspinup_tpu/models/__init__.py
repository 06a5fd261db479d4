"""Model registry: name → constructor, mirroring the reference's
``make_generator/make_discriminator`` by-kind factories
(``saicinpainting/training/modules/__init__.py:7-31``) and the
instant_nsr registries."""
from __future__ import annotations

from typing import Any

from drawingspinup_tpu.core.registry import DISCRIMINATORS, GENERATORS, MODELS


def _register_all() -> None:
    if "ffc_resnet" in GENERATORS:
        return
    from drawingspinup_tpu.models.ffc import (
        FFCNLayerDiscriminator, FFCResNetGenerator,
    )
    from drawingspinup_tpu.models.generator_j import (
        DiscriminatorN_IN, GeneratorJ, GeneratorJ_RIC,
    )
    from drawingspinup_tpu.models.pix2pixhd import (
        ConfigGlobalGenerator, GlobalGenerator,
        GlobalGeneratorFromSuperChannels, MultiDilatedGlobalGenerator,
        MultidilatedNLayerDiscriminator, NLayerDiscriminator,
    )

    GENERATORS.register("ffc_resnet")(FFCResNetGenerator)
    GENERATORS.register("pix2pixhd_global")(GlobalGenerator)
    GENERATORS.register("pix2pixhd_multidilated")(MultiDilatedGlobalGenerator)
    GENERATORS.register("pix2pixhd_global_config")(ConfigGlobalGenerator)
    GENERATORS.register("pix2pixhd_global_superchannels")(
        GlobalGeneratorFromSuperChannels)
    GENERATORS.register("GeneratorJ")(GeneratorJ)
    GENERATORS.register("GeneratorJ_RIC")(GeneratorJ_RIC)
    DISCRIMINATORS.register("ffc_nlayer")(FFCNLayerDiscriminator)
    DISCRIMINATORS.register("pix2pixhd_nlayer")(NLayerDiscriminator)
    DISCRIMINATORS.register("pix2pixhd_nlayer_multidilated")(
        MultidilatedNLayerDiscriminator)
    DISCRIMINATORS.register("DiscriminatorN_IN")(DiscriminatorN_IN)


def make_generator(kind: str, **kwargs: Any):
    """Reference ``make_generator(kind=...)``; extra torch-only kwargs in
    configs (e.g. init_conv_kwargs) are handled by the specific wrappers."""
    _register_all()
    return GENERATORS.make(kind, **kwargs)


def make_discriminator(kind: str, **kwargs: Any):
    _register_all()
    return DISCRIMINATORS.make(kind, **kwargs)
