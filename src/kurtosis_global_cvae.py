"""Compat shim -> trustedai_cl_vae_ad_tpu.models.kurtosis_global."""

from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE  # noqa: F401
