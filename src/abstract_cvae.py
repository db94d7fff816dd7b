"""Compat shim -> trustedai_cl_vae_ad_tpu.models.

The reference's AbstractCVAE is a Keras model; the stateful VAEModel wrapper
exposes the same method surface (encode/reparameterize/decode/call/
call_detailed/sample/compute_loss/train_step/test_step/train_step_and_run/
load_model), so it is exported under both names.
"""

from trustedai_cl_vae_ad_tpu.models import AbstractCVAE, VAEModel  # noqa: F401
