"""KurtosisGlobalCVAE: loss over global scalar latent statistics.

Parity with reference src/kurtosis_global_cvae.py:9-110. The batch latents are
treated as one flat distribution; the loss shapes its global mean/variance/
skew/kurtosis. Quirks preserved exactly:
  * cross-entropy diagnostic: softmax over the ENTIRE batch tensor
    (kurtosis_global_cvae.py:46-47).
  * "abs-KL" variant: 0.5*sum(|1 + logvar^2 - mean^2 - exp(logvar^2)|)
    (kurtosis_global_cvae.py:36-38) — logvar is squared, not the textbook form.
  * z_score uses divide_no_nan (zero where std == 0).
  * optimized loss = w_mse*mse + w_kurtosis*|K_t - K| + w_skew*|skew|
    + w_z_l1*mean(|z|) (kurtosis_global_cvae.py:91); x_std/var/mean losses are
    computed for the metric dict but NOT optimized.

The moment reductions route through ops.moments.global_moments, which uses a
fused Pallas kernel on TPU and a jnp fallback elsewhere.
"""

from __future__ import annotations

import jax.numpy as jnp

from trustedai_cl_vae_ad_tpu.models.cvae import AbstractCVAE, normalize_image_input
from trustedai_cl_vae_ad_tpu.ops.moments import global_moments, global_moments_weighted


def _abs_kl_terms(z_mean, z_logvar):
    """Per-element terms of the reference's quirky "abs-KL" diagnostic
    (kurtosis_global_cvae.py:36-38): logvar is SQUARED, not the textbook
    form. Shared by the unweighted and weighted (CL replay) paths so a
    parity fix can never drift between them."""
    return jnp.abs(1.0 + z_logvar**2 - z_mean**2 - jnp.exp(z_logvar**2))


class KurtosisGlobalCVAE(AbstractCVAE):
    def __post_init__(self):
        super().__post_init__()
        loss_config = self.config["loss"]
        self.kurtosis_target = float(loss_config["kurtosis"])
        self.w_mse = float(loss_config["w_mse"])
        self.w_kurtosis = float(loss_config["w_kurtosis"])
        self.w_skew = float(loss_config["w_skew"])
        self.w_kl_divergence = float(loss_config["w_kl_divergence"])
        self.w_z_l1_reg = float(loss_config["w_z_l1_reg"])
        self.w_x_std = float(loss_config.get("w_x_std", 0.0))

    def kl_divergence_gaussian(self, z_mean, z_logvar):
        """kurtosis_global_cvae.py:36-38 (note the squared logvar)."""
        return 0.5 * jnp.sum(_abs_kl_terms(z_mean, z_logvar))

    def log_normal_pdf(self, sample, mean, logvar, raxis=1):
        """kurtosis_global_cvae.py:27-29 (legacy ELBO helper)."""
        log2pi = jnp.log(2.0 * jnp.pi)
        return jnp.abs(
            jnp.mean(-0.5 * (((sample - mean) ** 2.0) * jnp.exp(-logvar) + logvar + log2pi), axis=raxis)
        )

    def compute_loss(self, params, x, training=False, return_inf=False, rng=None,
                     weights=None):
        """kurtosis_global_cvae.py:40-110 (compute_loss_new).

        ``weights`` (B,) optionally masks rows out of EVERY batch statistic
        (weight-0 rows contribute nothing); with all-ones weights this equals
        the unweighted path (tests/test_losses.py). Used by the CL step to pad
        the replay buffer to a fixed capacity without retracing per size.
        """
        x = normalize_image_input(x)
        x_hat_prob, z, mean, logvar = self.call_detailed(params, x, training, rng)

        if weights is None:
            # Entropy diagnostic: softmax over the whole tensor, as in reference.
            x_logit = jnp.log(jnp.exp(x) / jnp.sum(jnp.exp(x)))
            likelihood_cross_entropy = -jnp.mean(x_hat_prob * x_logit)

            mse = jnp.mean((x - x_hat_prob) ** 2)

            # Global latent statistics (fused on TPU).
            z_mean, z_var, z_skew, z_kurtosis = global_moments(z)
            z_std = jnp.sqrt(z_var)

            x_std = jnp.std(x, axis=0)
            x_hat_std = jnp.std(x_hat_prob, axis=0)
            x_std_loss = jnp.mean((x_std - x_hat_std) ** 2)

            kl_div_gaus = self.kl_divergence_gaussian(mean, logvar)
            z_l1_reg = jnp.mean(jnp.abs(z))
            r_min = jnp.min(x_hat_prob)
            r_max = jnp.max(x_hat_prob)
        else:
            from trustedai_cl_vae_ad_tpu.models.batch_stats import (
                weighted_image_stats,
                weighted_z_l1,
            )

            st = weighted_image_stats(x, x_hat_prob, weights)
            w, wx, wsum, n_el = st["w"], st["wx"], st["wsum"], st["n_el"]
            mse, x_std_loss = st["mse"], st["x_std_loss"]
            r_min, r_max = st["r_min"], st["r_max"]

            x_logit = jnp.log(jnp.exp(x) / jnp.sum(wx * jnp.exp(x)))
            likelihood_cross_entropy = -jnp.sum(wx * x_hat_prob * x_logit) / n_el

            z_mean, z_var, z_skew, z_kurtosis = global_moments_weighted(z, w)
            z_std = jnp.sqrt(z_var)

            wl = w[:, None]
            kl_div_gaus = 0.5 * jnp.sum(wl * _abs_kl_terms(mean, logvar))
            z_l1_reg = weighted_z_l1(z, w, wsum)

        mean_loss = z_mean**2  # computed, not optimized (metric only)
        var_loss = jnp.abs(1.0 - z_var)
        z_skew_loss = jnp.abs(z_skew)
        z_kurtosis_loss = jnp.abs(self.kurtosis_target - z_kurtosis)

        loss = (
            self.w_mse * mse
            + self.w_kurtosis * z_kurtosis_loss
            + self.w_skew * z_skew_loss
            + self.w_z_l1_reg * z_l1_reg
        )

        d = {
            "loss": loss,
            "mse": mse,
            "z_l1": z_l1_reg,
            "var_loss": var_loss,
            "skew_loss": z_skew_loss,
            "z_kurtosis_loss": z_kurtosis_loss,
            "z_kurtosis": z_kurtosis,
            "r_min": r_min,
            "r_max": r_max,
            "cross_entropy": likelihood_cross_entropy,
            "kl_div": kl_div_gaus,
            "x_std_loss": x_std_loss,
        }
        del mean_loss, z_std  # parity: computed in reference, unused in dict
        if return_inf:
            return d, x_hat_prob
        return d

    def compute_loss_chunked(self, params, x, chunks, training=False,
                             return_inf=False, rng=None):
        """compute_loss with all full-resolution image reductions evaluated in
        ``chunks`` sequential batch slices (``lax.map`` + ``jax.checkpoint``).

        Same math, same metric dict (matches compute_loss to float32 reduction
        precision — tests/test_losses.py), but no float32 [B, H, W, C] tensor
        is ever materialized: x stays uint8 (or its input dtype) in HBM, x_hat
        stays in the compute dtype, and each chunk's float32 view lives only
        inside a fused reduction. This matters on TPU: at the flagship shape
        the f32 x / x_hat / error tensors hit the XLA 2 GiB single-buffer
        limit at batch 896 and crash the compiler (BENCH_NOTES.md round 2),
        capping the Adam-amortization sweep at 768.

        ``x`` may be uint8 (normalized on device, data/ingest.py semantics) or
        pre-normalized float. The encoder consumes the same bf16/f32 cast
        chain as the unchunked path. The latent-side terms ([B, latent]) are
        small and computed exactly as compute_loss.
        """
        from trustedai_cl_vae_ad_tpu.models.chunked import (
            chunked_image_stats,
            encoder_view,
        )

        # forward (call_detailed semantics: encode without training — the
        # reference's dead input-noise path, abstract_cvae.py:139-144)
        mean, logvar = self.encode(params, encoder_view(x, self.dtype))
        z = self.reparameterize(mean, logvar, training=training, rng=rng)
        x_hat_prob = self.decode(params, z, apply_sigmoid=True)

        stats = chunked_image_stats(x, x_hat_prob, chunks, with_cross_entropy=True)
        mse = stats.mse
        x_std_loss = stats.x_std_loss
        r_min, r_max = stats.r_min, stats.r_max
        likelihood_cross_entropy = stats.cross_entropy

        # latent-side terms: identical to compute_loss (small tensors)
        z_mean, z_var, z_skew, z_kurtosis = global_moments(z)
        kl_div_gaus = self.kl_divergence_gaussian(mean, logvar)
        z_l1_reg = jnp.mean(jnp.abs(z))

        var_loss = jnp.abs(1.0 - z_var)
        z_skew_loss = jnp.abs(z_skew)
        z_kurtosis_loss = jnp.abs(self.kurtosis_target - z_kurtosis)

        loss = (
            self.w_mse * mse
            + self.w_kurtosis * z_kurtosis_loss
            + self.w_skew * z_skew_loss
            + self.w_z_l1_reg * z_l1_reg
        )

        d = {
            "loss": loss,
            "mse": mse,
            "z_l1": z_l1_reg,
            "var_loss": var_loss,
            "skew_loss": z_skew_loss,
            "z_kurtosis_loss": z_kurtosis_loss,
            "z_kurtosis": z_kurtosis,
            "r_min": r_min,
            "r_max": r_max,
            "cross_entropy": likelihood_cross_entropy,
            "kl_div": kl_div_gaus,
            "x_std_loss": x_std_loss,
        }
        del z_mean  # mean_loss: computed in reference, unused in dict
        if return_inf:
            return d, x_hat_prob
        return d
