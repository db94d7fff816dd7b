"""adam_lean (narrow-moment Adam) numerics vs optax.adam."""

import numpy as np
import pytest


def _setup():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    params = {
        "w": jnp.asarray(rng.normal(0, 1, (64, 32)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(0, 1, (32,)).astype(np.float32)),
    }
    grads_seq = [
        {"w": jnp.asarray(rng.normal(0, 0.1, (64, 32)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.1, (32,)).astype(np.float32))}
        for _ in range(10)
    ]
    return params, grads_seq


def _run(optimizer, params, grads_seq):
    import jax
    import optax

    state = optimizer.init(params)
    step = jax.jit(lambda g, s, p: optimizer.update(g, s, p))
    for g in grads_seq:
        updates, state = step(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_f32_moments_match_optax_exactly():
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    params, grads_seq = _setup()
    ref = _run(optax.adam(1e-2), dict(params), grads_seq)
    got = _run(adam_lean(1e-2, mu_dtype=jnp.float32, nu_dtype=jnp.float32),
               dict(params), grads_seq)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("sr", [False, True])
def test_bf16_moments_track_f32(sr):
    """bf16-stored moments (the flagship memory config) must track the f32
    trajectory to ~bf16 resolution."""
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    params, grads_seq = _setup()
    ref = _run(optax.adam(1e-2), dict(params), grads_seq)
    got = _run(adam_lean(1e-2, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
                         stochastic_round_nu=sr), dict(params), grads_seq)
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        # parameter values move by ~lr per step; after 10 steps the
        # narrow-moment drift must stay a small fraction of the movement
        moved = np.abs(r - np.asarray(params[k])).mean()
        drift = np.abs(g - r).mean()
        assert drift < 0.05 * moved, (k, drift, moved)


def test_state_memory_is_narrow():
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    params, _ = _setup()
    opt = adam_lean(1e-3)
    state = opt.init(params)
    lean = state[0]  # chain: (ScaleByAdamLeanState, scale state)
    assert jax.tree_util.tree_leaves(lean.mu)[0].dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(lean.nu)[0].dtype == jnp.bfloat16


def test_stochastic_rounding_is_unbiased():
    """Repeated SR casts of a constant must average to the constant (RTN
    instead freezes at the nearest representable)."""
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.adam import _stochastic_round_bf16

    x = jnp.full((20000,), 1.0009765625, jnp.float32)  # halfway-ish between bf16 steps
    key = jax.random.PRNGKey(0)
    y = np.asarray(_stochastic_round_bf16(x, key), np.float32)
    assert set(np.unique(y)).issubset({np.float32(1.0), np.float32(1.0078125)})
    np.testing.assert_allclose(y.mean(), 1.0009765625, atol=5e-4)
