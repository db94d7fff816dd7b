"""Seeded golden-value loss tests + loss-math semantics.

Replicates the structure of reference tests/test_kurtosis_global_cvae.py:151-178
and test_kurtosis_single_cvae.py:151-176: seeded CPU-deterministic params,
fixed random input batch, and full metric-dict comparison against hard-coded
goldens (regenerated for this implementation, as the reference goldens are
tied to TF's Philox RNG).

The batch-of-1 global case reproduces the reference's degenerate values
exactly: z_kurtosis=1.0, z_kurtosis_loss=2.0, skew_loss=0.0, x_std_loss=0.0
(reference golden dict :155-168).
"""

import numpy as np
import pytest

GLOBAL_GOLDEN = {
    "loss": 0.08548002690076828,
    "mse": 0.08325718343257904,
    "z_l1": 0.222844198346138,
    "var_loss": 0.9503404498100281,
    "skew_loss": 0.0,
    "z_kurtosis_loss": 2.0,
    "z_kurtosis": 1.0,
    "r_min": 0.49960488080978394,
    "r_max": 0.5006375908851624,
    "cross_entropy": 6.1280951499938965,
    "kl_div": 0.051827698945999146,
    "x_std_loss": 0.0,
}

SINGLE_GOLDEN = {
    "loss": 0.08387041091918945,
    "mse": 0.08329989016056061,
    "z_l1": 0.2602647840976715,
    "z_l2": 0.3755941390991211,
    "skew_loss": 0.23813767731189728,
    "z_kurtosis_loss": 0.194926917552948,
    "z_kurtosis": 2.564035177230835,
    "r_min": 0.4992847442626953,
    "r_max": 0.5013847351074219,
    "x_std_loss": 0.07807128876447678,
}


def test_global_loss_golden(tiny_config):
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    model = KurtosisGlobalCVAE(dict(tiny_config))
    params = model.init(jax.random.PRNGKey(42))
    x = np.random.RandomState(42).random((1, 224, 300, 3)).astype(np.float32)
    loss = model.compute_loss(params, x, training=False)
    assert set(loss.keys()) == set(GLOBAL_GOLDEN.keys())
    for k, v in loss.items():
        np.testing.assert_allclose(float(v), GLOBAL_GOLDEN[k], rtol=2e-3, atol=1e-5, err_msg=k)


def test_single_loss_golden(tiny_config):
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisSingleCVAE

    model = KurtosisSingleCVAE(dict(tiny_config))
    params = model.init(jax.random.PRNGKey(42))
    x = np.random.RandomState(42).random((16, 224, 300, 3)).astype(np.float32)
    loss = model.compute_loss(params, x, training=False)
    assert set(loss.keys()) == set(SINGLE_GOLDEN.keys())
    for k, v in loss.items():
        np.testing.assert_allclose(float(v), SINGLE_GOLDEN[k], rtol=2e-3, atol=1e-5, err_msg=k)


def test_global_loss_composition(tiny_config):
    """loss = w_mse*mse + w_kurt*|Kt-K| + w_skew*|skew| + w_z_l1*mean|z|."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    cfg = dict(tiny_config)
    cfg["loss"] = dict(cfg["loss"], w_mse=0.7, w_kurtosis=0.3, w_skew=0.11, w_z_l1_reg=0.05)
    model = KurtosisGlobalCVAE(cfg)
    params = model.init(jax.random.PRNGKey(1))
    x = np.random.RandomState(7).random((4, 224, 300, 3)).astype(np.float32)
    d = model.compute_loss(params, x)
    expected = (
        0.7 * float(d["mse"])
        + 0.3 * float(d["z_kurtosis_loss"])
        + 0.11 * float(d["skew_loss"])
        + 0.05 * float(d["z_l1"])
    )
    np.testing.assert_allclose(float(d["loss"]), expected, rtol=1e-5)


def test_single_loss_uses_l2_with_l1_weight(tiny_config):
    """The reference's weight-name mismatch (kurtosis_single_cvae.py:56-60)."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisSingleCVAE

    cfg = dict(tiny_config)
    cfg["loss"] = dict(cfg["loss"], w_mse=0.0, w_kurtosis=0.0, w_skew=0.0, w_z_l1_reg=1.0)
    model = KurtosisSingleCVAE(cfg)
    params = model.init(jax.random.PRNGKey(1))
    x = np.random.RandomState(7).random((8, 224, 300, 3)).astype(np.float32)
    d = model.compute_loss(params, x)
    np.testing.assert_allclose(float(d["loss"]), float(d["z_l2"]), rtol=1e-6)


def test_kl_divergence_abs_variant(tiny_config):
    """0.5*sum(|1 + logvar^2 - mean^2 - exp(logvar^2)|) (global :36-38)."""
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    model = KurtosisGlobalCVAE(dict(tiny_config))
    mean = jnp.array([[0.3, -0.2]])
    logvar = jnp.array([[0.1, 0.4]])
    got = float(model.kl_divergence_gaussian(mean, logvar))
    expected = 0.5 * np.sum(
        np.abs(1.0 + np.array([0.1, 0.4]) ** 2 - np.array([0.3, -0.2]) ** 2 - np.exp(np.array([0.1, 0.4]) ** 2))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_return_inf(tiny_config):
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    model = KurtosisGlobalCVAE(dict(tiny_config))
    params = model.init(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).random((2, 224, 300, 3)).astype(np.float32)
    d, x_hat = model.compute_loss(params, x, return_inf=True)
    assert x_hat.shape == x.shape
    assert "loss" in d


def test_training_reduces_loss(small_config):
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config

    cfg = dict(small_config)
    cfg["model"] = dict(cfg["model"], type="KurtosisSingle")
    model = load_model_from_config(cfg)
    model.compile()
    x = np.random.RandomState(3).random((16, 64, 64, 3)).astype(np.float32)
    first = float(model.train_step(x)["loss"])
    for _ in range(30):
        last = float(model.train_step(x)["loss"])
    assert last < first


def test_weighted_loss_masks_padding_exactly(small_config):
    """compute_loss(padded_x, weights) must equal compute_loss(valid_x) for
    every metric: weight-0 rows drop out of ALL batch statistics. This is
    what lets the CL step pad the replay buffer to a fixed capacity without
    changing the training math (stream/engine.py)."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import (
        KLGaussianCVAE,
        KurtosisGlobalCVAE,
        KurtosisSingleCVAE,
    )

    cfg = dict(small_config)
    rng = np.random.RandomState(11)
    n_valid, n_pad = 6, 10
    x = rng.random((n_valid, 64, 64, 3)).astype(np.float32)
    x_padded = np.concatenate(
        [x, np.zeros((n_pad, 64, 64, 3), np.float32)], axis=0
    )
    w = np.concatenate([np.ones(n_valid), np.zeros(n_pad)]).astype(np.float32)

    for cls in (KurtosisGlobalCVAE, KurtosisSingleCVAE, KLGaussianCVAE):
        core = cls(dict(cfg))
        params = core.init(jax.random.PRNGKey(0))
        ref = core.compute_loss(params, x, training=False)
        got = core.compute_loss(params, x_padded, training=False, weights=w)
        assert set(ref) == set(got)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-6,
                err_msg=f"{cls.__name__}.{k}",
            )


def test_weighted_loss_all_ones_matches_unweighted(small_config):
    """weights=ones must reproduce the unweighted path (same shapes/rng)."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import (
        KLGaussianCVAE,
        KurtosisGlobalCVAE,
        KurtosisSingleCVAE,
    )

    rng = np.random.RandomState(12)
    x = rng.random((8, 64, 64, 3)).astype(np.float32)
    w = np.ones(8, np.float32)
    key = jax.random.PRNGKey(3)

    for cls in (KurtosisGlobalCVAE, KurtosisSingleCVAE, KLGaussianCVAE):
        core = cls(dict(small_config))
        params = core.init(jax.random.PRNGKey(1))
        ref = core.compute_loss(params, x, training=True, rng=key)
        got = core.compute_loss(params, x, training=True, rng=key, weights=w)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-5, atol=1e-7,
                err_msg=f"{cls.__name__}.{k}",
            )


def test_chunked_loss_matches_unchunked(small_config):
    """compute_loss_chunked == compute_loss (values AND gradients).

    The chunked path exists so the flagship batch sweep can pass the XLA
    2 GiB single-buffer limit (BENCH_NOTES.md round 2: batch 896 crashes the
    compiler on the f32 [B,H,W,3] loss tensors). Math must be identical to
    f32 reduction precision.
    """
    import jax
    from trustedai_cl_vae_ad_tpu.models import (
        KLGaussianCVAE,
        KurtosisGlobalCVAE,
        KurtosisSingleCVAE,
    )

    rng = np.random.RandomState(7)
    x = rng.random((8, 64, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    for cls in (KurtosisGlobalCVAE, KurtosisSingleCVAE, KLGaussianCVAE):
        core = cls(dict(small_config))
        params = core.init(jax.random.PRNGKey(1))
        ref, ref_inf = core.compute_loss(params, x, training=True, rng=key, return_inf=True)
        for chunks in (1, 2, 4, 8):
            got, got_inf = core.compute_loss_chunked(
                params, x, chunks, training=True, rng=key, return_inf=True
            )
            assert set(got.keys()) == set(ref.keys())
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-5, atol=1e-6,
                    err_msg=f"{cls.__name__} chunks={chunks}.{k}",
                )
            np.testing.assert_allclose(np.asarray(got_inf), np.asarray(ref_inf), atol=1e-6)

        # gradients (the training path) must match too
        g_ref = jax.grad(lambda p: core.compute_loss(p, x, training=True, rng=key)["loss"])(params)
        g_got = jax.grad(
            lambda p: core.compute_loss_chunked(p, x, 4, training=True, rng=key)["loss"]
        )(params)
        flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
        flat_got, _ = jax.tree_util.tree_flatten(g_got)
        for a, b in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7,
                err_msg=cls.__name__,
            )


def test_chunked_loss_uint8_input(small_config):
    """uint8 frames normalize on device inside the chunks (ingest semantics)."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    rng = np.random.RandomState(11)
    x_u8 = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    x_f32 = x_u8.astype(np.float32) / 255.0
    key = jax.random.PRNGKey(9)

    core = KurtosisGlobalCVAE(dict(small_config))
    params = core.init(jax.random.PRNGKey(2))
    ref = core.compute_loss(params, x_f32, training=True, rng=key)
    got = core.compute_loss_chunked(params, x_u8, 2, training=True, rng=key)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-5, atol=1e-6, err_msg=k
        )


def test_unchunked_loss_uint8_matches_normalized_float(small_config):
    """The UNCHUNKED loss must honor the same uint8 contract as the chunked
    path: a raw uint8 batch equals its f32/255 twin on every family and every
    metric key (review round 4 — the ragged tail batch of a loss_chunks run
    used to fall through to compute_loss with raw 0-255 pixels)."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import (
        KLGaussianCVAE,
        KurtosisGlobalCVAE,
        KurtosisSingleCVAE,
    )

    rng = np.random.RandomState(13)
    x_u8 = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    x_f32 = x_u8.astype(np.float32) / 255.0
    key = jax.random.PRNGKey(7)

    for cls in (KurtosisGlobalCVAE, KurtosisSingleCVAE, KLGaussianCVAE):
        core = cls(dict(small_config))
        params = core.init(jax.random.PRNGKey(3))
        ref = core.compute_loss(params, x_f32, training=True, rng=key)
        got = core.compute_loss(params, x_u8, training=True, rng=key)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-6, atol=1e-7,
                err_msg=f"{cls.__name__}:{k}",
            )


def test_train_step_uint8_ragged_tail_normalizes(small_config):
    """loss_chunks set + a tail batch NOT divisible by chunks: the wrapper's
    fallback path must still train on [0,1] pixels, not raw 0-255 (the mse
    of a sane model on normalized data is < 1, vs O(10^4) on raw pixels)."""
    import copy

    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel

    cfg = copy.deepcopy(dict(small_config))
    cfg.setdefault("training", {})["loss_chunks"] = 2
    model = VAEModel(KurtosisGlobalCVAE(cfg))
    model.compile()
    rng = np.random.RandomState(5)
    tail = rng.randint(0, 256, (3, 64, 64, 3)).astype(np.uint8)  # 3 % 2 != 0
    loss, _ = model.train_step_and_run(tail)
    assert float(loss["mse"]) < 1.0, (
        f"ragged uint8 tail trained on unnormalized pixels: mse={float(loss['mse'])}"
    )


def test_predict_uint8_matches_normalized_float(small_config):
    """VAEModel.predict honors the uint8 contract (raw 0-255 pixels
    normalize on device) — it used to pre-cast to f32 and feed raw 0-255
    floats through the 'already normalized' path (review round 4)."""
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel

    model = VAEModel(KurtosisGlobalCVAE(dict(small_config)))
    rng = np.random.RandomState(11)
    x_u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    got = model.predict(x_u8)
    ref = model.predict(x_u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_chunked_loss_rejects_ragged_batch(small_config):
    import jax
    from trustedai_cl_vae_ad_tpu.models import KurtosisGlobalCVAE

    core = KurtosisGlobalCVAE(dict(small_config))
    params = core.init(jax.random.PRNGKey(0))
    x = np.zeros((6, 64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        core.compute_loss_chunked(params, x, 4)


KL_GAUSSIAN_GOLDEN = {
    "loss": 0.08337554335594177,
    "mse": 0.08329989016056061,
    "kl_div": 0.07565382122993469,
    "z_l1": 0.2602647840976715,
    "r_min": 0.4992847442626953,
    "r_max": 0.5013847351074219,
    "x_std_loss": 0.07807128876447678,
}


def test_kl_gaussian_loss_golden(tiny_config):
    """KLGaussianCVAE (new working model where the reference raises
    NotImplementedError): seeded golden dict, family test structure. mse /
    z_l1 / r_min / r_max / x_std_loss coincide with SINGLE_GOLDEN because the
    forward pass is the shared family forward — only the loss differs."""
    import jax
    from trustedai_cl_vae_ad_tpu.models import KLGaussianCVAE

    cfg = dict(tiny_config)
    cfg["loss"] = dict(cfg["loss"], w_kl_divergence=1e-3)
    model = KLGaussianCVAE(cfg)
    params = model.init(jax.random.PRNGKey(42))
    x = np.random.RandomState(42).random((16, 224, 300, 3)).astype(np.float32)
    loss = model.compute_loss(params, x, training=False)
    assert set(loss.keys()) == set(KL_GAUSSIAN_GOLDEN.keys())
    for k, v in loss.items():
        np.testing.assert_allclose(float(v), KL_GAUSSIAN_GOLDEN[k], rtol=2e-3,
                                   atol=1e-5, err_msg=k)
    # the optimized objective is exactly w_mse*mse + w_kl*kl_div
    np.testing.assert_allclose(
        float(loss["loss"]),
        float(loss["mse"]) + 1e-3 * float(loss["kl_div"]), rtol=1e-6)


def test_kl_gaussian_kl_is_true_divergence(tiny_config):
    """Analytic KL: non-negative everywhere, zero iff posterior == N(0,1)."""
    import jax.numpy as jnp
    from trustedai_cl_vae_ad_tpu.models.kl_gaussian import KLGaussianCVAE

    rng = np.random.RandomState(0)
    mean = jnp.asarray(rng.normal(0, 2, (8, 5)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(0, 1, (8, 5)).astype(np.float32))
    kl = float(KLGaussianCVAE.kl_divergence_gaussian(mean, logvar))
    assert kl > 0
    zero = float(KLGaussianCVAE.kl_divergence_gaussian(
        jnp.zeros((4, 5)), jnp.zeros((4, 5))))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)


def test_kl_gaussian_trains_and_roundtrips(small_config, tmp_path):
    """e2e: KLGaussian type trains on the synthetic config shape, loss
    decreases, and the checkpoint round-trips through the registry."""
    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import (
        load_model_from_config,
        load_model_from_directory,
    )

    cfg = dict(small_config)
    cfg["model"] = dict(cfg["model"], type="KLGaussian")
    cfg["loss"] = dict(cfg["loss"], w_kl_divergence=1e-4)
    model = load_model_from_config(cfg)
    model.compile()
    x = np.random.RandomState(3).random((16, 64, 64, 3)).astype(np.float32)
    first = float(model.train_step(x)["loss"])
    for _ in range(30):
        last = float(model.train_step(x)["loss"])
    assert last < first
    d = str(tmp_path / "klg")
    import os
    os.makedirs(d, exist_ok=True)
    save_config(cfg, os.path.join(d, "config.yml"))
    model.save_model(d)
    m2, cfg2 = load_model_from_directory(d)
    assert type(m2.core).__name__ == "KLGaussianCVAE"
    got = float(m2.compute_loss(x)["loss"])
    np.testing.assert_allclose(got, float(model.compute_loss(x)["loss"]),
                               rtol=1e-5)


def test_kl_gaussian_chunked_matches_unchunked(small_config):
    import jax
    from trustedai_cl_vae_ad_tpu.models import KLGaussianCVAE

    cfg = dict(small_config)
    cfg["loss"] = dict(cfg["loss"], w_kl_divergence=1e-3)
    core = KLGaussianCVAE(cfg)
    params = core.init(jax.random.PRNGKey(2))
    x = np.random.RandomState(5).random((8, 64, 64, 3)).astype(np.float32)
    ref = core.compute_loss(params, x, training=False)
    got = core.compute_loss_chunked(params, x, chunks=4, training=False)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
