"""TPU-native Kurtosis-CVAE anomaly-detection framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
reference repo gtemplin/TrustedAI-CL-VAE-AD (a TF2/Keras research codebase):
convolutional variational autoencoders whose latent distribution is shaped by
batch-moment regularizers (kurtosis / skew / z-L1) instead of a standard KL
term, used for reconstruction-error anomaly detection on video frames with
continual (online) learning.

Layer map (mirrors reference SURVEY.md section 1):
  L1 config & registry   -> trustedai_cl_vae_ad_tpu.config / .registry
  L2 model core          -> trustedai_cl_vae_ad_tpu.models
  L3 data layer          -> trustedai_cl_vae_ad_tpu.data
  L4 offline drivers     -> top-level CLIs (train.py, do_anomaly_detection.py, ...)
  L5 live apps           -> trustedai_cl_vae_ad_tpu.stream (+ Qt shells)
  L6 statistics utils    -> trustedai_cl_vae_ad_tpu.anomaly.cdf
plus TPU-native additions the reference lacks: .parallel (mesh / pjit data
parallelism), .ops (Pallas kernels for latent moments and streaming scoring),
and a double-buffered host->HBM ingest pipeline (.data.ingest).
"""

__version__ = "0.2.0"

# Some deployments pre-import jax with a platform plugin that overrides
# JAX_PLATFORMS, making the standard env var ineffective. TCVAE_PLATFORM
# gives users a working override (e.g. TCVAE_PLATFORM=cpu for the tool CLIs
# on machines where the accelerator is busy or absent).
import os as _os

_plat = _os.environ.get("TCVAE_PLATFORM")
if _plat:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# TCVAE_COMPILE_CACHE=<dir>: persistent XLA compilation cache. On
# remote-compile TPU runtimes the flagship's first jit costs 90-200 s PER
# PROCESS; with the cache, restarts (serving rollouts, tool CLIs) reload
# the compiled executable in seconds (measured: 29 s cold -> 4.5 s warm on
# the probe shape). Opt-in because the cache dir must be writable and
# per-XLA-version.
_cc = _os.environ.get("TCVAE_COMPILE_CACHE")
if _cc:
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir", _cc)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# TCVAE_CPU_DEVICES=N: virtual CPU device count for the multi-device code
# paths (train.py / do_anomaly_detection.py batch sharding) off-accelerator.
# Must land before backend init; ignored afterwards.
_ndev = _os.environ.get("TCVAE_CPU_DEVICES")
if _ndev:
    import jax as _jax

    try:
        _jax.config.update("jax_num_cpu_devices", int(_ndev))
    except Exception:
        pass

# TCVAE_CPU_COLLECTIVES=gloo|mpi: cross-process collective backend for
# multi-host runs on the CPU backend (train.py --distributed off-TPU, the
# 2-process tests). Must land before jax.distributed.initialize.
_ccoll = _os.environ.get("TCVAE_CPU_COLLECTIVES")
if _ccoll:
    import jax as _jax

    try:
        _jax.config.update("jax_cpu_collectives_implementation", _ccoll)
    except Exception:
        pass

from trustedai_cl_vae_ad_tpu.config import load_config, save_config  # noqa: F401
from trustedai_cl_vae_ad_tpu.registry import (  # noqa: F401
    import_vae_based_on_type,
    load_model_from_config,
    load_model_from_config_path,
    load_model_from_directory,
)
