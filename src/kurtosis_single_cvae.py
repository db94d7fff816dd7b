"""Compat shim -> trustedai_cl_vae_ad_tpu.models.kurtosis_single."""

from trustedai_cl_vae_ad_tpu.models import KurtosisSingleCVAE  # noqa: F401
