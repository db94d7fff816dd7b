"""TF numerical-semantics parity checks for the conv stack.

The reference model is Keras Conv2D / Conv2DTranspose with padding='same'
(abstract_cvae.py:32, :83, :88). For <1e-5 reconstruction parity given equal
weights, our lax-based layers must match TF's asymmetric-SAME padding and
Keras Conv2DTranspose's gradient-of-conv semantics. Keras Conv2DTranspose(
filters, k, strides, 'same') computes exactly the input-gradient of a
Conv2D(in_ch, k, strides, 'same') whose kernel is the transpose-flipped
version — so we validate flax ConvTranspose(transpose_kernel=True) against
jax.vjp of the forward convolution (the definitional identity).
"""

import numpy as np


def test_convtranspose_matches_conv_gradient():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    rng = np.random.RandomState(0)
    # forward conv: (B, 10, 14, 8) -> (B, 5, 7, 5), stride 2 SAME, kernel 3
    x_shape = (2, 10, 14, 8)
    kernel = jnp.asarray(rng.randn(3, 3, 8, 5), jnp.float32)  # (k, k, in, out)
    g = jnp.asarray(rng.randn(2, 5, 7, 5), jnp.float32)

    def fwd(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(fwd, jnp.zeros(x_shape, jnp.float32))
    (grad_x,) = vjp(g)

    # ConvTranspose with transpose_kernel=True and kernel (k, k, out=8, in=5)
    # applied to g must equal grad_x.
    ct = nn.ConvTranspose(
        features=8, kernel_size=(3, 3), strides=(2, 2), padding="SAME", transpose_kernel=True
    )
    # flax transpose_kernel kernel shape: (k, k, features, in_features) = (3,3,8,5)
    variables = {"params": {"kernel": kernel, "bias": jnp.zeros(8)}}
    out = ct.apply(variables, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grad_x), rtol=1e-5, atol=1e-5)


def test_convtranspose_stride1_same():
    """The decoder's final stride-1 'same' transposed conv (abstract_cvae.py:88)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    rng = np.random.RandomState(1)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 6), jnp.float32)  # conv: 3ch -> 6ch
    g = jnp.asarray(rng.randn(2, 9, 11, 6), jnp.float32)

    def fwd(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    _, vjp = jax.vjp(fwd, jnp.zeros((2, 9, 11, 3), jnp.float32))
    (grad_x,) = vjp(g)
    ct = nn.ConvTranspose(
        features=3, kernel_size=(3, 3), strides=(1, 1), padding="SAME", transpose_kernel=True
    )
    out = ct.apply({"params": {"kernel": kernel, "bias": jnp.zeros(3)}}, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grad_x), rtol=1e-5, atol=1e-5)


def test_same_padding_asymmetry():
    """TF 'same' stride-2 k=3 on even dims pads (0, 1) — verify lax matches."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1)
    k = jnp.ones((3, 1, 1, 1), jnp.float32)
    same = jax.lax.conv_general_dilated(
        x, k, (2, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # TF formula: pad_total = max((ceil(8/2)-1)*2 + 3 - 8, 0) = 1 -> (0, 1)
    manual = jax.lax.conv_general_dilated(
        x, k, (2, 1), [(0, 1), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_array_equal(np.asarray(same), np.asarray(manual))
    assert same.shape == (1, 4, 1, 1)


def test_decoder_output_shape_odd(tiny_config):
    """224x300 with 2 stride-2 layers: 56x75 -> 112x150 -> 224x300 exactly."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    m = KurtosisGlobalCVAE(dict(tiny_config))
    params = m.init(jax.random.PRNGKey(0))
    z = np.zeros((1, 2), np.float32)
    out = m.decode(params, z)
    assert out.shape == (1, 224, 300, 3)


def test_rgb_head_s2d_matches_convtranspose():
    """The decoder's fast space-to-depth head == nn.ConvTranspose exactly
    (fwd + both grads), cf. models/cvae.py _rgb_head_s2d."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from trustedai_cl_vae_ad_tpu.models.cvae import _rgb_head_s2d

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 20, 32), jnp.float32)
    P = jnp.asarray(rng.randn(3, 3, 3, 32), jnp.float32)
    bias = jnp.asarray(rng.randn(3), jnp.float32)
    ct = nn.ConvTranspose(
        features=3, kernel_size=(3, 3), strides=(1, 1), padding="SAME", transpose_kernel=True
    )
    ref_fn = lambda x, P: ct.apply({"params": {"kernel": P, "bias": bias}}, x)
    y_ref = ref_fn(x, P)
    y = _rgb_head_s2d(x, P, bias, s=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    gx_ref = jax.grad(lambda x: jnp.sum(ref_fn(x, P) * g))(x)
    gx = jax.grad(lambda x: jnp.sum(_rgb_head_s2d(x, P, bias) * g))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-5)
    gp_ref = jax.grad(lambda P: jnp.sum(ref_fn(x, P) * g))(P)
    gp = jax.grad(lambda P: jnp.sum(_rgb_head_s2d(x, P, bias) * g))(P)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=5e-5)


def test_upconv2x_subpixel_matches_convtranspose():
    """Sub-pixel stride-2 upconv == nn.ConvTranspose (fwd + both grads)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from trustedai_cl_vae_ad_tpu.models.cvae import _upconv2x_subpixel

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 6, 9, 7), jnp.float32)
    P = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32)
    bias = jnp.asarray(rng.randn(5), jnp.float32)
    ct = nn.ConvTranspose(
        features=5, kernel_size=(3, 3), strides=(2, 2), padding="SAME", transpose_kernel=True
    )
    ref_fn = lambda x, P: ct.apply({"params": {"kernel": P, "bias": bias}}, x)
    y_ref = ref_fn(x, P)
    y = _upconv2x_subpixel(x, P, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    gx_ref = jax.grad(lambda x: jnp.sum(ref_fn(x, P) * g))(x)
    gx = jax.grad(lambda x: jnp.sum(_upconv2x_subpixel(x, P, bias) * g))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-5)
    gp_ref = jax.grad(lambda P: jnp.sum(ref_fn(x, P) * g))(P)
    gp = jax.grad(lambda P: jnp.sum(_upconv2x_subpixel(x, P, bias) * g))(P)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref), atol=5e-5)


def test_encoder_s2d_matches_stride2_conv():
    """_conv1_s2d == nn.Conv(strides=2, padding='SAME') to float tolerance,
    including BOTH gradients (kernel and input), on even H, W."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from trustedai_cl_vae_ad_tpu.models.cvae import _conv1_s2d

    rng = jax.random.PRNGKey(3)
    for (h, w) in [(8, 12), (224 // 4, 300 // 6)]:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, h), 3)
        x = jax.random.normal(k1, (2, h, w, 3), jnp.float32)
        kernel = jax.random.normal(k2, (3, 3, 3, 16), jnp.float32) * 0.1
        bias = jax.random.normal(k3, (16,), jnp.float32)

        def ref_fn(x, kernel, bias):
            y = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias

        y_ref = ref_fn(x, kernel, bias)
        y_s2d = _conv1_s2d(x, kernel, bias)
        assert y_s2d.shape == y_ref.shape == (2, h // 2, w // 2, 16)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

        # gradients via a scalar loss touching every output
        cot = jax.random.normal(jax.random.fold_in(rng, h + 1), y_ref.shape)
        g_ref = jax.grad(lambda x, k, b: jnp.sum(ref_fn(x, k, b) * cot),
                         argnums=(0, 1, 2))(x, kernel, bias)
        g_s2d = jax.grad(lambda x, k, b: jnp.sum(_conv1_s2d(x, k, b) * cot),
                         argnums=(0, 1, 2))(x, kernel, bias)
        for a, b in zip(g_s2d, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_encoder_s2d_flag_preserves_params_and_forward(tiny_config):
    """model.s2d_input: identical param tree (checkpoint-interchangeable) and
    identical encoder outputs; odd spatial sizes fall back to plain conv."""
    import copy

    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE

    cfg = copy.deepcopy(tiny_config)
    base = KurtosisGlobalCVAE(cfg)
    cfg2 = copy.deepcopy(cfg)
    cfg2["model"]["s2d_input"] = True
    fast = KurtosisGlobalCVAE(cfg2)

    params = base.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fast.init(jax.random.PRNGKey(0))
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, *base.encoder_input_shape))
    e0 = base.encoder.apply({"params": params["encoder"]}, x)
    e1 = fast.encoder.apply({"params": params["encoder"]}, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), rtol=2e-5, atol=2e-5)

    # odd input: fallback branch, still identical
    x_odd = x[:, : x.shape[1] - 1, : x.shape[2] - 1, :]
    e0 = base.encoder.apply({"params": params["encoder"]}, x_odd)
    e1 = fast.encoder.apply({"params": params["encoder"]}, x_odd)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), rtol=2e-5, atol=2e-5)
