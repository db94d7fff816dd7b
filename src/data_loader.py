"""Compat shim -> trustedai_cl_vae_ad_tpu.data.loader."""

from trustedai_cl_vae_ad_tpu.data.loader import load_data  # noqa: F401
