from trustedai_cl_vae_ad_tpu.models.cvae import AbstractCVAE, Encoder, Decoder, compute_dense_shape  # noqa: F401
from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE  # noqa: F401
from trustedai_cl_vae_ad_tpu.models.kurtosis_single import KurtosisSingleCVAE  # noqa: F401
from trustedai_cl_vae_ad_tpu.models.kl_gaussian import KLGaussianCVAE  # noqa: F401
from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel, make_optimizer  # noqa: F401
