"""training.optimizer config knob (wrapper.make_optimizer) + fp8-state
checkpoint roundtrip through the log-dir ABI."""

import jax.numpy as jnp
import numpy as np
import pytest

from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel, make_optimizer
from trustedai_cl_vae_ad_tpu.registry import load_model_from_config


def _config(optimizer=None):
    cfg = {
        "data": {"image_size": [32, 32, 3]},
        "loss": {
            "kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
            "w_mse": 1.0, "w_skew": 0.0, "w_x_std": 0.0, "w_z_l1_reg": 0.0,
        },
        "model": {
            "type": "KurtosisGlobal", "latent_dimensions": 8,
            "layers": [4, 8], "decoder_dense_filters": 4,
        },
        "training": {
            "batch_size": 4, "beta": 0.98, "learning_rate": 1e-3,
            "max_epochs": 1,
        },
    }
    if optimizer:
        cfg["training"]["optimizer"] = optimizer
    return cfg


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="training.optimizer"):
        make_optimizer(1e-3, name="sgd")


def test_fp8_knob_trains_and_lr_dial_works():
    model = load_model_from_config(_config(optimizer="adam_fp8"))
    model.compile()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    losses = [float(model.train_step(x)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all()
    model.set_learning_rate(5e-4)  # injected hyperparam must survive fp8 state
    assert abs(model.learning_rate - 5e-4) < 1e-9
    loss = float(model.train_step(x)["loss"])
    assert np.isfinite(loss)


def test_fp8_state_checkpoint_roundtrip(tmp_path):
    """The QLeaf (q fp8, scale, scale_next) state must survive the log-dir
    optimizer checkpoint and resume training identically."""
    model = load_model_from_config(_config(optimizer="adam_fp8"))
    model.compile()
    x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3), jnp.float32)
    for _ in range(3):
        model.train_step(x)
    d = str(tmp_path / "logdir")
    model.save_model(d)

    resumed = load_model_from_config(_config(optimizer="adam_fp8"))
    resumed.compile()
    resumed.load_model(d, restore_optimizer=True)

    import jax

    for a, b in zip(jax.tree_util.tree_leaves(model.opt_state),
                    jax.tree_util.tree_leaves(resumed.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a.astype(jnp.float32)),
                                      np.asarray(b.astype(jnp.float32)))
    # one more identical step on both must agree exactly (sync the RNG
    # streams first — the original consumed 3 keys, the resumed none, and
    # reparameterize noise differs otherwise; the reference never persists
    # RNG state either)
    resumed._rng = model._rng
    la = model.train_step(x)["loss"]
    lb = resumed.train_step(x)["loss"]
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
