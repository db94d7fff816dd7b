"""YAML config I/O and log-directory stamping.

Behavior parity with reference src/load_model.py:34-62 (safe_load/safe_dump)
and train.py:58-91 (logdir stamping + config copy). The config schema is the
reference's 4-section YAML (README.md:52-85): ``data`` / ``loss`` / ``model``
/ ``training`` plus a runtime-injected ``logdir``.
"""

from __future__ import annotations

import datetime
import os
from typing import Any

import yaml


def load_config(config_filename: str) -> dict:
    """Load a YAML config file. Mirrors reference load_model.py:34-50."""
    assert os.path.exists(config_filename)
    assert os.path.isfile(config_filename)
    with open(config_filename, "r") as ifile:
        return yaml.safe_load(ifile)


def save_config(config: dict, config_filename: str) -> None:
    """Persist a config dict as YAML. Mirrors reference load_model.py:52-62."""
    with open(config_filename, "w") as ofile:
        yaml.safe_dump(_plain(config), ofile)


def _plain(obj: Any) -> Any:
    """Coerce numpy / jax scalars into YAML-safe builtins."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return obj
    return obj


def stamp_logdir(config: dict, base_dir: str = "./logs", prefix: str = "fit") -> dict:
    """Create logs/<prefix>_<timestamp>, inject into config, copy config there.

    Mirrors reference train.py:75-89.
    """
    logdir = os.path.abspath(
        os.path.join(base_dir, f"{prefix}_{datetime.datetime.now().strftime('%Y%m%d-%H%M%S')}")
    )
    os.makedirs(logdir, exist_ok=True)
    config["logdir"] = logdir
    save_config(config, os.path.join(logdir, "config.yml"))
    return config


# ---------------------------------------------------------------------------
# Schema helpers / validation
# ---------------------------------------------------------------------------

_REQUIRED_SECTIONS = ("data", "loss", "model", "training")


def validate_config(config: dict) -> dict:
    """Light schema validation for the 4-section YAML (reference README.md:52-85).

    Returns the config unchanged so it can be used inline. Raises ValueError
    with an actionable message on missing keys.
    """
    for section in _REQUIRED_SECTIONS:
        if section not in config:
            raise ValueError(f"config missing required section '{section}'")
    model = config["model"]
    if "latent_dimensions" not in model:
        raise ValueError("config['model'] missing 'latent_dimensions'")
    if "layers" not in model or not model["layers"]:
        raise ValueError("config['model'] missing non-empty 'layers'")
    if "decoder_dense_filters" not in model:
        raise ValueError("config['model'] missing 'decoder_dense_filters'")
    data = config["data"]
    if "image_size" not in data or len(data["image_size"]) != 3:
        raise ValueError("config['data']['image_size'] must be [W, H, C]")
    return config
