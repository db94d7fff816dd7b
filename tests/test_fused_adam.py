"""Fused Adam kernel: exact equivalence with the jnp reference math."""

import numpy as np
import pytest


def _tree(rng, shapes):
    import jax.numpy as jnp

    return {k: jnp.asarray(rng.randn(*s).astype(np.float32)).astype(jnp.bfloat16)
            for k, s in shapes.items()}


def test_fused_adam_matches_reference_interpret():
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.ops import fused_adam

    rng = np.random.RandomState(0)
    shapes = {"big": (2048, 640), "small": (16, 8)}  # big takes the kernel path
    params = _tree(rng, shapes)
    grads = _tree(np.random.RandomState(1), shapes)

    old = fused_adam._INTERPRET
    fused_adam._INTERPRET = True
    try:
        p1, s1 = fused_adam.apply(
            {k: jnp.copy(v) for k, v in params.items()}, grads,
            fused_adam.init_state(params), 1e-3,
        )
    finally:
        fused_adam._INTERPRET = old
    p2, s2 = fused_adam.apply_reference(params, grads, fused_adam.init_state(params), 1e-3)
    for k in shapes:
        np.testing.assert_array_equal(
            np.asarray(p1[k].astype(jnp.float32)), np.asarray(p2[k].astype(jnp.float32)),
        )
        np.testing.assert_array_equal(np.asarray(s1.mu[k]), np.asarray(s2.mu[k]))
        np.testing.assert_array_equal(np.asarray(s1.nu[k]), np.asarray(s2.nu[k]))
    assert int(s1.count) == 1


def test_fused_adam_multiple_steps_track_optax():
    """bf16-moment Adam stays close to optax's f32 Adam over a few steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from trustedai_cl_vae_ad_tpu.ops import fused_adam

    rng = np.random.RandomState(2)
    p0 = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    params_a = {"w": p0.astype(jnp.bfloat16)}
    params_b = {"w": p0}
    opt = optax.adam(1e-2)
    st_b = opt.init(params_b)
    st_a = fused_adam.init_state(params_a)
    for i in range(5):
        g = jnp.asarray(np.random.RandomState(10 + i).randn(64, 32).astype(np.float32))
        params_a, st_a = fused_adam.apply(params_a, {"w": g.astype(jnp.bfloat16)}, st_a, 1e-2)
        up, st_b = opt.update({"w": g}, st_b, params_b)
        params_b = optax.apply_updates(params_b, up)
    a = np.asarray(params_a["w"].astype(jnp.float32))
    b = np.asarray(params_b["w"])
    np.testing.assert_allclose(a, b, atol=0.05)  # bf16 moment quantization
