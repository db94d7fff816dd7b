"""Compat shim -> trustedai_cl_vae_ad_tpu.registry / .config."""

from trustedai_cl_vae_ad_tpu.config import load_config, save_config  # noqa: F401
from trustedai_cl_vae_ad_tpu.registry import (  # noqa: F401
    AVAILABLE_TYPES,
    import_vae_based_on_type,
    load_model_from_config,
    load_model_from_config_path,
    load_model_from_directory,
)
