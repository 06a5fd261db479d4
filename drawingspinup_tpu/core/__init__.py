from drawingspinup_tpu.core.config import Config, config_from_dict, load_config, resolve
from drawingspinup_tpu.core.contract import UidPaths, VIEWS, list_actions, load_uid_list
from drawingspinup_tpu.core.registry import (
    DATASETS, DISCRIMINATORS, GENERATORS, MODELS, SYSTEMS, Registry,
)

__all__ = [
    "Config", "config_from_dict", "load_config", "resolve",
    "UidPaths", "VIEWS", "list_actions", "load_uid_list",
    "Registry", "MODELS", "SYSTEMS", "DATASETS", "GENERATORS", "DISCRIMINATORS",
]
