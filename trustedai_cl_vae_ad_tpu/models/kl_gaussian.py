"""KLGaussianCVAE: the textbook Gaussian-ELBO variant, made real.

The reference names this type in its registry and raises NotImplementedError
(src/load_model.py:9-31); the only hint of its intent is the dead legacy loss
``compute_loss_old`` (src/kurtosis_global_cvae.py:113-133), a Monte-Carlo
ELBO wrapped in stray ``abs`` calls. Match-or-beat means shipping the working
model: this class implements the standard beta-VAE objective with the
ANALYTIC Gaussian KL,

    loss = w_mse * MSE(x, x_hat) + w_kl_divergence * KL(q(z|x) || N(0, I))
    KL   = -0.5 * mean_batch sum_dims (1 + logvar - mean^2 - exp(logvar))

on the family's shared encoder/decoder (models/cvae.py), so checkpoints,
tools, and the CL stream all work unchanged. Family quirks that live in
AbstractCVAE (z = mean + 0.5*logvar + eps, the dead input-noise path, sigmoid
decode) apply here too — the registry type only selects the loss.

Metric-dict keys follow the family convention (tests/test_losses.py):
diagnostics (z_l1, x_std_loss, r_min/r_max) are computed but only mse and
kl_div are optimized.
"""

from __future__ import annotations

import jax.numpy as jnp

from trustedai_cl_vae_ad_tpu.models.cvae import AbstractCVAE, normalize_image_input


class KLGaussianCVAE(AbstractCVAE):
    def __post_init__(self):
        super().__post_init__()
        loss_config = self.config["loss"]
        self.w_mse = float(loss_config["w_mse"])
        self.w_kl_divergence = float(loss_config["w_kl_divergence"])

    @staticmethod
    def _kl_rows(mean, logvar):
        """Per-row analytic KL(N(mean, exp(logvar)) || N(0, 1)) — shared by
        the unweighted (batch mean) and weighted (CL replay) paths so the
        formula can never drift between them."""
        return -0.5 * jnp.sum(1.0 + logvar - mean**2 - jnp.exp(logvar), axis=1)

    @staticmethod
    def kl_divergence_gaussian(mean, logvar):
        """Analytic KL(N(mean, exp(logvar)) || N(0, 1)), mean over the batch.

        The textbook form — NOT the reference's abs-KL diagnostic with its
        squared logvar (kurtosis_global_cvae.py:36-38): this term is
        optimized here, so it must be a true divergence (non-negative, zero
        iff the posterior is standard normal).
        """
        return jnp.mean(KLGaussianCVAE._kl_rows(mean, logvar))

    def compute_loss(self, params, x, training=False, return_inf=False, rng=None,
                     weights=None):
        """ELBO loss + family-convention metric dict.

        ``weights`` (B,) optionally masks rows out of every batch statistic
        (CL replay padding, see KurtosisGlobalCVAE.compute_loss).
        """
        x = normalize_image_input(x)
        x_hat_prob, z, mean, logvar = self.call_detailed(params, x, training, rng)

        if weights is None:
            mse = jnp.mean((x - x_hat_prob) ** 2)
            kl_div = self.kl_divergence_gaussian(mean, logvar)

            x_std = jnp.std(x, axis=0)
            x_hat_std = jnp.std(x_hat_prob, axis=0)
            x_std_loss = jnp.mean((x_std - x_hat_std) ** 2)

            z_l1_reg = jnp.mean(jnp.abs(z))
            r_min = jnp.min(x_hat_prob)
            r_max = jnp.max(x_hat_prob)
        else:
            from trustedai_cl_vae_ad_tpu.models.batch_stats import (
                weighted_image_stats,
                weighted_z_l1,
            )

            st = weighted_image_stats(x, x_hat_prob, weights)
            mse, x_std_loss = st["mse"], st["x_std_loss"]
            r_min, r_max = st["r_min"], st["r_max"]

            kl_div = jnp.sum(st["w"] * self._kl_rows(mean, logvar)) / st["wsum"]
            z_l1_reg = weighted_z_l1(z, st["w"], st["wsum"])

        loss = self.w_mse * mse + self.w_kl_divergence * kl_div

        d = {
            "loss": loss,
            "mse": mse,
            "kl_div": kl_div,
            "z_l1": z_l1_reg,
            "r_min": r_min,
            "r_max": r_max,
            "x_std_loss": x_std_loss,
        }
        if return_inf:
            return d, x_hat_prob
        return d

    def compute_loss_chunked(self, params, x, chunks, training=False,
                             return_inf=False, rng=None):
        """compute_loss with the image-space reductions evaluated in
        ``chunks`` sequential batch slices (models/chunked.py): no
        full-resolution float32 tensors. Same math, same metric dict."""
        from trustedai_cl_vae_ad_tpu.models.chunked import (
            chunked_image_stats,
            encoder_view,
        )

        mean, logvar = self.encode(params, encoder_view(x, self.dtype))
        z = self.reparameterize(mean, logvar, training=training, rng=rng)
        x_hat_prob = self.decode(params, z, apply_sigmoid=True)

        stats = chunked_image_stats(x, x_hat_prob, chunks)
        kl_div = self.kl_divergence_gaussian(mean, logvar)
        z_l1_reg = jnp.mean(jnp.abs(z))

        loss = self.w_mse * stats.mse + self.w_kl_divergence * kl_div

        d = {
            "loss": loss,
            "mse": stats.mse,
            "kl_div": kl_div,
            "z_l1": z_l1_reg,
            "r_min": stats.r_min,
            "r_max": stats.r_max,
            "x_std_loss": stats.x_std_loss,
        }
        if return_inf:
            return d, x_hat_prob
        return d
