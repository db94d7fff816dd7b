"""Model-type registry and directory loaders.

Parity with reference src/load_model.py:9-83: the same three type names,
KurtosisGlobal as the default when no type is given, the deepcopy guard, and
the log-directory loader (config.yml + weights). Deviation: 'KLGaussian'
resolves to a working textbook-ELBO model (models/kl_gaussian.py) where the
reference raises NotImplementedError (docs/MIGRATION.md).

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
            # The reference raises NotImplementedError here (load_model.py:24);
            # this build ships the working textbook-ELBO model instead
            # (models/kl_gaussian.py; deviation recorded in docs/MIGRATION.md).
            from trustedai_cl_vae_ad_tpu.models.kl_gaussian import KLGaussianCVAE

            return KLGaussianCVAE
        elif vae_type.lower() == "kurtosisglobal":
            from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

            return KurtosisGlobalCVAE
        elif vae_type.lower() == "kurtosissingle":
            from trustedai_cl_vae_ad_tpu.models.kurtosis_single import KurtosisSingleCVAE

            return KurtosisSingleCVAE
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    return KurtosisGlobalCVAE


def resolve_precision(config: dict):
    """(compute dtype, param dtype) from config['training']['precision'].

    New knob, default 'float32': 'bfloat16' is the TPU production mode used
    by the benchmarks (f32 loss reductions either way); 'mixed' keeps f32
    params with bf16 compute.
    """
    import jax.numpy as jnp

    precision = str(config.get("training", {}).get("precision", "float32")).lower()
    if precision in ("bfloat16", "bf16"):
        return jnp.bfloat16, jnp.bfloat16
    elif precision == "mixed":
        return jnp.bfloat16, jnp.float32
    elif precision in ("float32", "f32", "fp32"):
        return jnp.float32, jnp.float32
    raise ValueError(
        f"Unknown training.precision {precision!r}: "
        f"use float32, bfloat16, or mixed"
    )


def build_core_from_config(config: dict):
    """The functional core only — NO parameter allocation. For consumers
    that bring their own params (e.g. serve.py's int8-checkpoint boot, which
    must not materialize the multi-GB float tree it is skipping)."""
    core_cls = import_vae_based_on_type(config["model"].get("type"))
    dtype, param_dtype = resolve_precision(config)
    return core_cls(deepcopy(config), dtype=dtype, param_dtype=param_dtype)


def load_model_from_config(config: dict):
    """Build the stateful wrapper (fresh random params). load_model.py:70-72."""
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel

    return VAEModel(build_core_from_config(config))


def load_model_from_config_path(config_path: str):
    assert os.path.exists(config_path)
    config = load_config(config_path)
    return load_model_from_config(config), config


def load_model_from_directory(log_dir: str, restore_optimizer=None):
    """config.yml + checkpointed weights from a log dir (load_model.py:74-83).

    ``restore_optimizer`` is forwarded to VAEModel.load_model (default None:
    moments restored only if already compiled). Pass True for training/CL
    resume — one checkpoint read restores params AND moments (callers used to
    re-load the whole 5+ GB flagship weight tree a second time for this).
    """
    assert os.path.exists(log_dir)
    assert os.path.isdir(log_dir)
    config_path = os.path.join(log_dir, "config.yml")
    model, config = load_model_from_config_path(config_path)
    model.load_model(log_dir, restore_optimizer=restore_optimizer)
    return model, config
