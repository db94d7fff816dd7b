"""Reference-checkpoint import: TF SavedModel -> flax transplant parity.

Proves the BASELINE.json "<1e-5 reconstruction MSE vs reference" target end
to end: a real TF/Keras model with the reference architecture
(abstract_cvae.py:22-92) is saved as a SavedModel, its weights are imported
through the pure-Python TensorBundle reader (no TF involved in the read), and
the flax forward must match the TF forward on the same inputs.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

CONFIG = {
    "data": {"image_size": [20, 24, 3]},
    "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
             "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
    "model": {"type": "KurtosisGlobal", "latent_dimensions": 6,
              "layers": [4, 8], "decoder_dense_filters": 4},
    "training": {"batch_size": 4, "beta": 1e-6, "learning_rate": 1e-3,
                 "max_epochs": 1},
}


def _build_tf_twins(config, seed=0):
    """TF/Keras encoder+decoder with the reference's architecture
    (abstract_cvae.py:22-92), deterministic random weights."""
    import keras

    size = config["data"]["image_size"]
    latent = config["model"]["latent_dimensions"]
    layers_cfg = config["model"]["layers"]
    edf = config["model"].get("encoder_dense_filters")

    enc_layers = [keras.layers.InputLayer(tuple(size))]
    for f in layers_cfg:
        enc_layers.append(keras.layers.Conv2D(f, 3, strides=(2, 2),
                                              padding="same", activation="relu"))
    enc_layers.append(keras.layers.Flatten())
    if edf:
        enc_layers.append(keras.layers.Dense(int(edf)))
    enc_layers.append(keras.layers.Dense(2 * latent))
    encoder = keras.Sequential(enc_layers, name="encoder")

    n = len(layers_cfg)
    dw, dh = size[0] // 2**n, size[1] // 2**n
    ddf = config["model"]["decoder_dense_filters"]
    dec_layers = [
        keras.layers.InputLayer((latent,)),
        keras.layers.Dense(dw * dh * ddf, activation="relu"),
        keras.layers.Reshape((dw, dh, ddf)),
    ]
    for f in reversed(layers_cfg):
        dec_layers.append(keras.layers.Conv2DTranspose(f, 3, strides=2,
                                                       padding="same", activation="relu"))
    dec_layers.append(keras.layers.Conv2DTranspose(size[2], 3, strides=1, padding="same"))
    decoder = keras.Sequential(dec_layers, name="decoder")

    rng = np.random.RandomState(seed)
    for model in (encoder, decoder):
        model.set_weights([rng.normal(0, 0.2, w.shape).astype(np.float32)
                           for w in model.get_weights()])
    return encoder, decoder


@pytest.fixture(scope="module")
def ref_dir(tmp_path_factory):
    """A reference-style log dir: encoder/ + decoder/ SavedModels + config.yml."""
    import yaml

    d = tmp_path_factory.mktemp("ref_ckpt")
    encoder, decoder = _build_tf_twins(CONFIG)
    tf.saved_model.save(encoder, str(d / "encoder"))
    tf.saved_model.save(decoder, str(d / "decoder"))
    (d / "config.yml").write_text(yaml.safe_dump(CONFIG))
    return d, encoder, decoder


def test_pure_bundle_reader_matches_tf(ref_dir):
    """The no-TF TensorBundle reader must return byte-identical tensors to
    tf.train.load_checkpoint."""
    d, _, _ = ref_dir
    from trustedai_cl_vae_ad_tpu.train.tf_import import read_tf_bundle

    prefix = os.path.join(str(d / "encoder"), "variables", "variables")
    ours = read_tf_bundle(prefix)
    reader = tf.train.load_checkpoint(prefix)
    tf_keys = [k for k in reader.get_variable_to_shape_map()
               if "VARIABLE_VALUE" in k]
    assert tf_keys, "probe found no variables"
    for k in tf_keys:
        assert k in ours, f"pure reader missed {k}"
        np.testing.assert_array_equal(ours[k], np.asarray(reader.get_tensor(k)))


def test_transplant_forward_parity(ref_dir):
    """Same weights + same input => encoder/decoder outputs match TF to well
    under the 1e-5 MSE target (BASELINE.json; reference abstract_cvae.py:95-106)."""
    d, encoder, decoder = ref_dir
    from trustedai_cl_vae_ad_tpu.train.tf_import import import_tf_checkpoint

    model, config = import_tf_checkpoint(str(d))

    rng = np.random.RandomState(1)
    x = rng.random((3, 20, 24, 3)).astype(np.float32)
    tf_latent = encoder(tf.constant(x)).numpy()
    mean, logvar = model.encode(x)
    ours_latent = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=1)
    mse_latent = float(np.mean((tf_latent - ours_latent) ** 2))
    assert mse_latent < 1e-5, mse_latent

    z = tf_latent[:, :6]
    tf_rec = decoder(tf.constant(z)).numpy()
    ours_rec = np.asarray(model.decode(z, apply_sigmoid=False))
    assert tf_rec.shape == ours_rec.shape
    mse_rec = float(np.mean((tf_rec - ours_rec) ** 2))
    rel = mse_rec / max(float(np.mean(tf_rec**2)), 1e-12)
    assert mse_rec < 1e-5, (mse_rec, rel)

    # end-to-end reconstruction through both stages
    tf_full = decoder(encoder(tf.constant(x))[:, :6]).numpy()
    ours_full = np.asarray(model.decode(np.asarray(mean), apply_sigmoid=False))
    assert float(np.mean((tf_full - ours_full) ** 2)) < 1e-5


def test_import_roundtrip_through_our_checkpoint(ref_dir, tmp_path):
    """tools/import_tf_checkpoint.py flow: import -> save in our ABI ->
    load_model_from_directory -> identical outputs."""
    d, encoder, _ = ref_dir
    import yaml

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.train.tf_import import import_tf_checkpoint

    model, config = import_tf_checkpoint(str(d))
    out = tmp_path / "converted"
    out.mkdir()
    model.save_model(str(out), include_optimizer=False)
    save_config(config, str(out / "config.yml"))

    reloaded, _cfg = load_model_from_directory(str(out))
    reloaded.load_model(str(out), restore_optimizer=False)
    x = np.random.RandomState(2).random((2, 20, 24, 3)).astype(np.float32)
    tf_latent = encoder(tf.constant(x)).numpy()
    mean, logvar = reloaded.encode(x)
    ours = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=1)
    assert float(np.mean((tf_latent - ours) ** 2)) < 1e-5


def test_shape_mismatch_rejected(ref_dir):
    """A config that doesn't match the checkpoint must fail loudly with the
    offending layer named, not silently mis-transplant."""
    d, _, _ = ref_dir
    import copy

    from trustedai_cl_vae_ad_tpu.train.tf_import import import_tf_checkpoint

    bad = copy.deepcopy(CONFIG)
    bad["model"]["latent_dimensions"] = 9
    with pytest.raises(ValueError, match="shape"):
        import_tf_checkpoint(str(d), config=bad)


def test_export_then_import_roundtrip(tmp_path):
    """flax -> TF SavedModel (tf_export) -> flax (tf_import) must be lossless,
    and the exported TF models must reproduce our forward to <1e-5 MSE —
    the reference-tooling interop contract both ways."""
    import jax
    import yaml

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.train.tf_export import export_tf_checkpoint
    from trustedai_cl_vae_ad_tpu.train.tf_import import import_tf_checkpoint

    model = load_model_from_config(dict(CONFIG))
    ours = tmp_path / "ours"
    ours.mkdir()
    model.save_model(str(ours), include_optimizer=False)
    save_config(dict(CONFIG), str(ours / "config.yml"))

    exported = tmp_path / "exported"
    export_tf_checkpoint(str(ours), str(exported))
    assert (exported / "encoder").is_dir() and (exported / "decoder").is_dir()
    assert (exported / "config.yml").exists()

    # TF-side forward parity against the exported SavedModel signatures
    x = np.random.RandomState(3).random((2, 20, 24, 3)).astype(np.float32)
    enc = tf.saved_model.load(str(exported / "encoder"))
    enc_fn = enc.signatures.get("serving_default") or next(iter(enc.signatures.values()))
    tf_latent = list(enc_fn(tf.constant(x)).values())[0].numpy()
    mean, logvar = model.encode(x)
    ours_latent = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=1)
    assert float(np.mean((tf_latent - ours_latent) ** 2)) < 1e-5

    dec = tf.saved_model.load(str(exported / "decoder"))
    dec_fn = dec.signatures.get("serving_default") or next(iter(dec.signatures.values()))
    z = ours_latent[:, :6]
    tf_rec = list(dec_fn(tf.constant(z)).values())[0].numpy()
    ours_rec = np.asarray(model.decode(z, apply_sigmoid=False))
    assert float(np.mean((tf_rec - ours_rec) ** 2)) < 1e-5

    # bit-exact weight roundtrip through the importer
    back, _cfg = import_tf_checkpoint(str(exported))
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
