"""models/batch_stats.py: the single definition of weighted batch statistics.

The three loss families rely on one invariant: padding a batch with
weight-0 rows changes NOTHING — every statistic equals the unweighted
statistic over just the valid rows (the fixed-capacity replay contract,
stream/engine.py). The family-level masked-loss tests exercise this through
whole models; these pin the shared arithmetic directly, so a drift here has
a unit-sized failure instead of three model-sized ones.
"""

import jax.numpy as jnp
import numpy as np

from trustedai_cl_vae_ad_tpu.models.batch_stats import (
    weighted_image_stats,
    weighted_z_l1,
)


def _batch(n, seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(n, 6, 5, 3), jnp.float32)
    xh = jnp.asarray(rng.rand(n, 6, 5, 3), jnp.float32)
    return x, xh


def _unweighted(x, xh):
    return {
        "mse": float(jnp.mean((x - xh) ** 2)),
        "x_std_loss": float(jnp.mean(
            (jnp.std(x, axis=0) - jnp.std(xh, axis=0)) ** 2)),
        "r_min": float(jnp.min(xh)),
        "r_max": float(jnp.max(xh)),
    }


def test_all_ones_weights_equal_unweighted():
    x, xh = _batch(8, 0)
    st = weighted_image_stats(x, xh, jnp.ones(8))
    want = _unweighted(x, xh)
    for k, v in want.items():
        np.testing.assert_allclose(float(st[k]), v, rtol=1e-6, err_msg=k)
    assert float(st["wsum"]) == 8.0
    assert float(st["n_el"]) == 8.0 * 6 * 5 * 3


def test_zero_weight_rows_are_exactly_excluded():
    """stats(valid ++ garbage rows, weights=[1...1,0...0]) == stats(valid)."""
    x, xh = _batch(5, 1)
    # garbage padding rows with EXTREME values: any leakage into the means,
    # stds, or min/max is loud
    pad_x = jnp.full((3, 6, 5, 3), 1e6, jnp.float32)
    pad_xh = jnp.full((3, 6, 5, 3), -1e6, jnp.float32)
    xp = jnp.concatenate([x, pad_x])
    xhp = jnp.concatenate([xh, pad_xh])
    w = jnp.asarray([1.0] * 5 + [0.0] * 3)

    st = weighted_image_stats(xp, xhp, w)
    want = _unweighted(x, xh)
    for k, v in want.items():
        np.testing.assert_allclose(float(st[k]), v, rtol=1e-6, err_msg=k)


def test_weighted_z_l1_matches_masked_mean():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(6, 4), jnp.float32)
    w = jnp.asarray([1.0, 1.0, 0.0, 1.0, 0.0, 1.0])
    got = float(weighted_z_l1(z, w, jnp.sum(w)))
    want = float(jnp.mean(jnp.abs(z[jnp.asarray([0, 1, 3, 5])])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fractional_weights_are_population_weighted():
    """Non-binary weights: mse is the w-weighted mean of per-row mses."""
    x, xh = _batch(4, 3)
    w = jnp.asarray([0.5, 2.0, 1.0, 0.25])
    st = weighted_image_stats(x, xh, w)
    per_row = jnp.mean((x - xh) ** 2, axis=(1, 2, 3))
    want = float(jnp.sum(w * per_row) / jnp.sum(w))
    np.testing.assert_allclose(float(st["mse"]), want, rtol=1e-6)
