"""Reverse-free ConvTranspose VJP vs flax nn.ConvTranspose autodiff."""

import numpy as np
import pytest


@pytest.mark.parametrize("shape,strides,cin,cout", [
    ((2, 6, 5, 3), (2, 2), 3, 4),
    ((2, 7, 9, 4), (2, 2), 4, 2),
    ((1, 8, 8, 2), (1, 1), 2, 3),
    ((3, 5, 6, 1), (2, 2), 1, 5),
])
def test_fwd_and_grads_match_flax(shape, strides, cin, cout):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.convt import conv_transpose_same

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    P = jnp.asarray(rng.normal(0, 1, (3, 3, cout, cin)).astype(np.float32))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(features=cout, kernel_size=(3, 3),
                                    strides=strides, padding="SAME",
                                    transpose_kernel=True, use_bias=False)(x)

    m = M()

    def ref(x, P):
        return m.apply({"params": {"ConvTranspose_0": {"kernel": P}}}, x)

    y_ref = ref(x, P)
    y = conv_transpose_same(x, P, strides)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    dy = jnp.asarray(rng.normal(0, 1, y.shape).astype(np.float32))
    dx_ref, dP_ref = jax.grad(lambda x, P: jnp.sum(ref(x, P) * dy), (0, 1))(x, P)
    dx, dP = jax.grad(lambda x, P: jnp.sum(conv_transpose_same(x, P, strides) * dy),
                      (0, 1))(x, P)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dP), np.asarray(dP_ref), atol=1e-4, rtol=1e-5)


def test_module_param_tree_matches_flax(small_config):
    """ConvTransposeG under name='ConvTranspose_i' produces the identical
    parameter tree (checkpoint-compatible) and forward."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.convt import ConvTransposeG

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(features=5, kernel_size=(3, 3), strides=(2, 2),
                                    padding="SAME", transpose_kernel=True)(x)

    class Fast(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvTransposeG(features=5, strides=(2, 2), name="ConvTranspose_0")(x)

    x = jnp.asarray(np.random.RandomState(1).normal(0, 1, (2, 8, 6, 3)).astype(np.float32))
    p_ref = Ref().init(jax.random.PRNGKey(0), x)
    p_fast = Fast().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_fast)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fast)):
        assert a.shape == b.shape
    y_ref = Ref().apply(p_ref, x)
    y_fast = Fast().apply(p_ref, x)  # same params both ways
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-6)
