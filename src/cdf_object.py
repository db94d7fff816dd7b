"""Compat shim -> trustedai_cl_vae_ad_tpu.anomaly.cdf."""

from trustedai_cl_vae_ad_tpu.anomaly.cdf import BSTProb, CDFObject  # noqa: F401
