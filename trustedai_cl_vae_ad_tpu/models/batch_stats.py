"""Weighted (masked-batch) image-space statistics shared by both loss
families.

The fixed-capacity replay buffer pads batches with weight-0 rows
(stream/engine.py); every batch statistic must exclude them EXACTLY for the
masked loss to equal the unmasked loss on the valid rows
(tests/test_losses.py). KurtosisGlobalCVAE and KurtosisSingleCVAE used to
duplicate this arithmetic line-for-line; a fix applied to one silently
missed the other — this is the single definition.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_image_stats(x, x_hat_prob, weights):
    """Weighted mse / per-pixel std-matching loss / masked r_min,r_max.

    Returns a dict also carrying the reusable weight tensors (w, wx, wsum,
    n_el) for the family-specific terms (cross-entropy, abs-KL, z_l1).
    All reductions are population (ddof=0) over the weighted batch, matching
    the unweighted tf/jnp expressions when weights are all-ones.
    """
    w = jnp.asarray(weights, jnp.float32)
    wx = w[:, None, None, None]
    wsum = jnp.sum(w)
    n_el = wsum * (x.shape[1] * x.shape[2] * x.shape[3])

    mse = jnp.sum(wx * (x - x_hat_prob) ** 2) / n_el

    x_wmean = jnp.sum(wx * x, axis=0) / wsum
    x_std = jnp.sqrt(jnp.sum(wx * (x - x_wmean) ** 2, axis=0) / wsum)
    xh_wmean = jnp.sum(wx * x_hat_prob, axis=0) / wsum
    x_hat_std = jnp.sqrt(jnp.sum(wx * (x_hat_prob - xh_wmean) ** 2, axis=0) / wsum)
    x_std_loss = jnp.mean((x_std - x_hat_std) ** 2)

    valid = wx > 0
    r_min = jnp.min(jnp.where(valid, x_hat_prob, jnp.inf))
    r_max = jnp.max(jnp.where(valid, x_hat_prob, -jnp.inf))
    return {
        "w": w, "wx": wx, "wsum": wsum, "n_el": n_el,
        "mse": mse, "x_std_loss": x_std_loss, "r_min": r_min, "r_max": r_max,
    }


def weighted_z_l1(z, w, wsum):
    """Weighted mean |z| over valid rows (the reference's z_l1_reg)."""
    return jnp.sum(w[:, None] * jnp.abs(z)) / (wsum * z.shape[1])
