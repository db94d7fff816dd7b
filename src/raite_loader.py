"""Compat shim -> trustedai_cl_vae_ad_tpu.data.raite."""

from trustedai_cl_vae_ad_tpu.data.raite import RaiteDataset, benchmark_epochs  # noqa: F401
