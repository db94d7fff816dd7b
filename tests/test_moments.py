"""Fused latent-moment kernel vs jnp reference (tolerance 1e-6), incl. grads."""

import numpy as np
import pytest
import scipy.stats


def test_global_moments_match_scipy():
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    z = np.random.RandomState(0).randn(32, 16).astype(np.float32) * 2.1 + 0.3
    m, var, skew, kurt = moments.global_moments(jnp.asarray(z))
    flat = z.reshape(-1).astype(np.float64)
    np.testing.assert_allclose(float(m), flat.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(var), flat.var(), rtol=1e-5)
    np.testing.assert_allclose(float(skew), scipy.stats.skew(flat), rtol=1e-4, atol=1e-5)
    # scipy kurtosis is excess (fisher); reference uses raw E[zs^4]
    np.testing.assert_allclose(
        float(kurt), scipy.stats.kurtosis(flat, fisher=False), rtol=1e-4, atol=1e-5
    )


def test_perdim_moments_match_scipy():
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    z = np.random.RandomState(1).randn(64, 8).astype(np.float32)
    m, var, skew, kurt = moments.perdim_moments(jnp.asarray(z))
    z64 = z.astype(np.float64)
    np.testing.assert_allclose(np.asarray(m), z64.mean(0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), z64.var(0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(skew), scipy.stats.skew(z64, axis=0), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kurt), scipy.stats.kurtosis(z64, axis=0, fisher=False), rtol=1e-3, atol=1e-5
    )


def test_degenerate_constant_input():
    """divide_no_nan semantics: skew/kurt are 0 when std == 0 (TF parity)."""
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    # use a power-of-two constant: the mean is then exact in f32, so var is
    # exactly 0 and the divide_no_nan guard engages (with an inexact constant
    # the var is ~1e-14 and z-scores collapse to +-1 — same as TF)
    z = jnp.full((8, 4), 2.0, jnp.float32)
    m, var, skew, kurt = moments.global_moments(z)
    assert float(m) == pytest.approx(2.0, rel=1e-6)
    assert float(var) == 0.0
    assert float(skew) == 0.0
    assert float(kurt) == 0.0
    m, var, skew, kurt = moments.perdim_moments(z)
    assert np.all(np.asarray(skew) == 0.0)
    assert np.all(np.asarray(kurt) == 0.0)


def test_pallas_kernel_interpret_matches_jnp():
    """Run the actual Pallas kernels (interpret mode on CPU) vs jnp reference."""
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    z = np.random.RandomState(2).randn(16, 128).astype(np.float32)
    ref_g = moments.global_moments_reference(jnp.asarray(z))
    ref_p = moments.perdim_moments_reference(jnp.asarray(z))
    old = moments._INTERPRET
    moments._INTERPRET = True
    try:
        got_g = moments._global_moments_pallas(jnp.asarray(z))
        got_p = moments._perdim_moments_pallas(jnp.asarray(z))
    finally:
        moments._INTERPRET = old
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    for a, b in zip(got_p, ref_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def _loss_through_moments(fn, weights):
    import jax.numpy as jnp

    def loss(z):
        m, var, skew, kurt = fn(z)
        return (
            weights[0] * jnp.sum(m)
            + weights[1] * jnp.sum(var)
            + weights[2] * jnp.sum(skew)
            + weights[3] * jnp.sum(kurt)
        )

    return loss


@pytest.mark.parametrize("which", ["global", "perdim"])
def test_custom_vjp_matches_autodiff(which):
    """Analytic VJP vs jax autodiff through the pure-jnp formulas."""
    import jax
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    z = jnp.asarray(np.random.RandomState(3).randn(12, 6).astype(np.float32))
    if which == "global":
        fused = moments.global_moments
        ref = moments.global_moments_reference
    else:
        fused = moments.perdim_moments
        ref = moments.perdim_moments_reference
    w = (0.3, -0.7, 1.1, 0.9)
    g_fused = jax.grad(_loss_through_moments(fused, w))(z)
    g_ref = jax.grad(_loss_through_moments(ref, w))(z)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_degenerate_no_nan():
    import jax
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import moments

    z = jnp.full((8, 4), 2.0, jnp.float32)
    g = jax.grad(_loss_through_moments(moments.global_moments, (1.0, 1.0, 1.0, 1.0)))(z)
    assert np.all(np.isfinite(np.asarray(g)))
