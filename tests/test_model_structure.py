"""Config -> architecture shape invariants.

Replicates the structure assertions of reference
tests/test_kurtosis_global_cvae.py:58-148 / test_kurtosis_single_cvae.py
(layer counts, latent output size, dense reshape units, filter counts,
collapse errors) against the JAX parameter pytrees.
"""

import numpy as np
import pytest


def _models(config):
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, KurtosisSingleCVAE

    return [KurtosisGlobalCVAE(dict(config)), KurtosisSingleCVAE(dict(config))]


def test_import():
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, KurtosisSingleCVAE

    assert KurtosisGlobalCVAE is not None
    assert KurtosisSingleCVAE is not None


def test_build(tiny_config):
    for m in _models(tiny_config):
        assert m is not None


def test_encoder_structure(tiny_config):
    import jax

    for m in _models(tiny_config):
        params = m.init(jax.random.PRNGKey(0))
        enc = params["encoder"]
        n_conv = len(tiny_config["model"]["layers"])
        # conv layers + optional dense + latent dense
        assert len(enc) == n_conv + 2
        # per-layer filter counts (reference test_encoder_filters :108-123)
        for idx, filters in enumerate(tiny_config["model"]["layers"]):
            kernel = enc[f"Conv_{idx}"]["kernel"]
            assert kernel.shape[-1] == filters
            assert kernel.shape[:2] == (3, 3)
        assert enc["Dense_0"]["kernel"].shape[1] == tiny_config["model"]["encoder_dense_filters"]
        # latent output = 2 * latent_dimensions (reference :89-96)
        assert enc["Dense_1"]["kernel"].shape[1] == 2 * tiny_config["model"]["latent_dimensions"]


def test_decoder_structure(tiny_config):
    import jax

    for m in _models(tiny_config):
        params = m.init(jax.random.PRNGKey(0))
        dec = params["decoder"]
        layers = tiny_config["model"]["layers"]
        # dense units = floor(W/2^L) * floor(H/2^L) * decoder_dense_filters
        w, h, _ = tiny_config["data"]["image_size"]
        L = len(layers)
        dense_units = (w // 2**L) * (h // 2**L) * tiny_config["model"]["decoder_dense_filters"]
        assert dec["Dense_0"]["kernel"].shape == (
            tiny_config["model"]["latent_dimensions"],
            dense_units,
        )
        # reversed filter order (reference test_decoder_filters :126-138)
        for i, filters in enumerate(reversed(layers)):
            # transpose_kernel=True: kernel shape (3, 3, out_features, in_features)
            assert dec[f"ConvTranspose_{i}"]["kernel"].shape[2] == filters
        # final output conv produces image channels
        out_kernel = dec[f"ConvTranspose_{L}"]["kernel"]
        assert out_kernel.shape[2] == tiny_config["data"]["image_size"][2]


def test_io_shapes(tiny_config):
    for m in _models(tiny_config):
        assert list(m.encoder_input_shape) == tiny_config["data"]["image_size"]
        x = np.zeros([2] + tiny_config["data"]["image_size"], np.float32)
        import jax

        params = m.init(jax.random.PRNGKey(0))
        x_hat, z, mean, logvar = m.call_detailed(params, x)
        assert x_hat.shape == x.shape
        latent = tiny_config["model"]["latent_dimensions"]
        assert z.shape == (2, latent)
        assert mean.shape == (2, latent)
        assert logvar.shape == (2, latent)


def test_width_collapse_raises(tiny_config):
    """Reference abstract_cvae.py:65-68 collapse RuntimeErrors."""
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    cfg = dict(tiny_config)
    cfg["data"] = {"image_size": [4, 300, 3]}
    cfg["model"] = dict(tiny_config["model"], layers=[5, 5, 5])
    with pytest.raises(RuntimeError, match="Width Collapse"):
        KurtosisGlobalCVAE(cfg)
    cfg["data"] = {"image_size": [300, 4, 3]}
    with pytest.raises(RuntimeError, match="Height Collapse"):
        KurtosisGlobalCVAE(cfg)


def test_registry(tiny_config):
    from trustedai_cl_vae_ad_tpu.registry import import_vae_based_on_type
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE, KurtosisSingleCVAE

    assert import_vae_based_on_type(None) is KurtosisGlobalCVAE
    assert import_vae_based_on_type("KurtosisGlobal") is KurtosisGlobalCVAE
    assert import_vae_based_on_type("KurtosisSingle") is KurtosisSingleCVAE
    # deviation from the reference (NotImplementedError, load_model.py:24):
    # KLGaussian is a working model type here (docs/MIGRATION.md)
    from trustedai_cl_vae_ad_tpu.models import KLGaussianCVAE

    assert import_vae_based_on_type("KLGaussian") is KLGaussianCVAE
    with pytest.raises(Exception, match="not found in available types"):
        import_vae_based_on_type("Bogus")


def test_reparameterize_semantics(tiny_config):
    """z = mean + 0.5*logvar + eps; eps zero at eval (abstract_cvae.py:124-129)."""
    import jax
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    m = KurtosisGlobalCVAE(dict(tiny_config))
    mean = jnp.array([[1.0, 2.0]])
    logvar = jnp.array([[0.5, -0.5]])
    z_eval = m.reparameterize(mean, logvar, training=False)
    np.testing.assert_allclose(np.asarray(z_eval), [[1.25, 1.75]], rtol=1e-6)
    z_train = m.reparameterize(mean, logvar, training=True, rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(z_train), np.asarray(z_eval))


def test_precision_knob(small_config):
    """training.precision selects bf16/mixed/f32 compute+param dtypes."""
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    for precision, (dt, pdt) in {
        "float32": (jnp.float32, jnp.float32),
        "bfloat16": (jnp.bfloat16, jnp.bfloat16),
        "mixed": (jnp.bfloat16, jnp.float32),
    }.items():
        cfg = dict(small_config)
        cfg["training"] = dict(cfg["training"], precision=precision)
        m = load_model_from_config(cfg)
        assert m.core.dtype == dt and m.core.param_dtype == pdt
        leaf = jax.tree_util.tree_leaves(m.params)[0]
        assert leaf.dtype == pdt
        if precision == "bfloat16":
            m.compile()
            x = np.random.RandomState(0).random((4, 64, 64, 3)).astype(np.float32)
            loss = m.train_step(x)
            assert np.isfinite(float(loss["loss"]))


def test_precision_unknown_raises(small_config):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    cfg = dict(small_config)
    cfg["training"] = dict(cfg["training"], precision="float16")
    with pytest.raises(ValueError, match="precision"):
        load_model_from_config(cfg)


def test_wrapper_encode_training_adds_input_noise(small_config):
    """encode(x, training=True) must fuzz the input with N(0, beta) like the
    reference (abstract_cvae.py:115-118) instead of silently ignoring the
    flag (ADVICE round 1)."""
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel

    model = VAEModel(KurtosisGlobalCVAE(dict(small_config)))
    x = np.random.RandomState(0).random((2, 64, 64, 3)).astype(np.float32)

    mean_eval, logvar_eval = model.encode(x)
    mean_eval2, _ = model.encode(x, training=False)
    np.testing.assert_array_equal(np.asarray(mean_eval), np.asarray(mean_eval2))

    model.beta = 0.5
    mean_tr, _ = model.encode(x, training=True)
    assert not np.allclose(np.asarray(mean_tr), np.asarray(mean_eval))

    # beta == 0: the fuzz term vanishes, training == eval exactly
    model.beta = 0.0
    mean_tr0, logvar_tr0 = model.encode(x, training=True)
    np.testing.assert_allclose(np.asarray(mean_tr0), np.asarray(mean_eval), rtol=1e-6)
