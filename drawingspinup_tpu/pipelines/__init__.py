"""Registry plumbing for the reconstruction stack (reference
``instant_nsr/{datasets,systems,models}/__init__.py`` name→class pattern)."""
from drawingspinup_tpu.core.registry import DATASETS, MODELS, SYSTEMS


def _register() -> None:
    if "neus" in MODELS:
        return
    from drawingspinup_tpu.models.fields import (
        RadianceConfig, SDFFieldConfig,
    )
    from drawingspinup_tpu.pipelines.stage2_recon import (
        load_ortho_data, recon_uid,
    )
    from drawingspinup_tpu.train.nsr import NSRConfig

    MODELS.register("neus")(NSRConfig)
    MODELS.register("volume-sdf")(SDFFieldConfig)
    MODELS.register("volume-radiance")(RadianceConfig)
    SYSTEMS.register("ortho-neus-system")(recon_uid)
    DATASETS.register("ortho")(load_ortho_data)


# Call _register() to populate the registries; kept lazy so importing the
# pipelines package stays lightweight (stage pipelines pull in jax models).
