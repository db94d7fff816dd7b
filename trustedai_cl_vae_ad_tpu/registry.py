"""Model-type registry and directory loaders.

Parity with reference src/load_model.py:9-83: the same three type names
('KLGaussian' raising NotImplementedError, 'KurtosisGlobal', 'KurtosisSingle'),
KurtosisGlobal as the default when no type is given, the deepcopy guard, and
the log-directory loader (config.yml + weights).

The checkpoint ABI differs TPU-side: instead of Keras SavedModels, the log
dir holds Orbax checkpoints (see train/checkpoint.py) under the same
``encoder/`` + ``decoder/`` subdirectory names, plus ``config.yml`` — so the
on-disk directory layout every downstream tool consumes is preserved.
"""

from __future__ import annotations

import os
from copy import deepcopy

from trustedai_cl_vae_ad_tpu.config import load_config

AVAILABLE_TYPES = [
    "KLGaussian",
    "KurtosisGlobal",
    "KurtosisSingle",
]


def import_vae_based_on_type(vae_type: str | None):
    """Resolve a model class by config['model']['type'] (load_model.py:9-31)."""
    if vae_type is not None:
        if vae_type not in AVAILABLE_TYPES:
            raise Exception(
                f"Error, type {vae_type} not found in available types: {AVAILABLE_TYPES}"
            )
        if vae_type.lower() == "klgaussian":
            raise NotImplementedError("KLGaussian not yet implemented")
        elif vae_type.lower() == "kurtosisglobal":
            from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

            return KurtosisGlobalCVAE
        elif vae_type.lower() == "kurtosissingle":
            from trustedai_cl_vae_ad_tpu.models.kurtosis_single import KurtosisSingleCVAE

            return KurtosisSingleCVAE
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    return KurtosisGlobalCVAE


def load_model_from_config(config: dict):
    """Build the stateful wrapper (fresh random params). load_model.py:70-72."""
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel

    core_cls = import_vae_based_on_type(config["model"].get("type"))
    return VAEModel(core_cls(deepcopy(config)))


def load_model_from_config_path(config_path: str):
    assert os.path.exists(config_path)
    config = load_config(config_path)
    return load_model_from_config(config), config


def load_model_from_directory(log_dir: str):
    """config.yml + checkpointed weights from a log dir (load_model.py:74-83)."""
    assert os.path.exists(log_dir)
    assert os.path.isdir(log_dir)
    config_path = os.path.join(log_dir, "config.yml")
    model, config = load_model_from_config_path(config_path)
    model.load_model(log_dir)
    return model, config
