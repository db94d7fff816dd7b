"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the project build rules. Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# In this environment jax is pre-imported at interpreter startup (before
# conftest), so the env vars above may be too late; jax.config.update still
# works as long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture
def tiny_config():
    """Mirror of the reference test fixture (tests/test_kurtosis_*_cvae.py:30-56)."""
    return {
        "data": {"image_size": [224, 300, 3]},
        "loss": {
            "kurtosis": 3.0,
            "w_kl_divergence": 0.0,
            "w_kurtosis": 1e-3,
            "w_mse": 1.0,
            "w_skew": 0.0,
            "w_x_std": 1e-10,
            "w_z_l1_reg": 1e-3,
        },
        "model": {
            "decoder_dense_filters": 4,
            "encoder_dense_filters": 4,
            "latent_dimensions": 2,
            "layers": [5, 5],
        },
        "training": {
            "batch_size": 16,
            "beta": 1e-6,
            "learning_rate": 1e-4,
            "max_epochs": 10,
        },
    }


@pytest.fixture
def small_config():
    """Small 64x64 config (BASELINE.json config #1 shape) for fast e2e tests."""
    return {
        "data": {"image_size": [64, 64, 3]},
        "loss": {
            "kurtosis": 1.8,
            "w_kl_divergence": 0.0,
            "w_kurtosis": 1e-4,
            "w_mse": 1.0,
            "w_skew": 0.0,
            "w_x_std": 0.0,
            "w_z_l1_reg": 0.0,
        },
        "model": {
            "decoder_dense_filters": 8,
            "latent_dimensions": 32,
            "layers": [8, 16],
        },
        "training": {
            "batch_size": 16,
            "beta": 1e-6,
            "learning_rate": 1e-3,
            "max_epochs": 2,
        },
    }
