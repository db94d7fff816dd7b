"""Export a trained model BACK to the reference's TF SavedModel layout.

Inverse of train/tf_import.py: builds TF/Keras twins of the reference
architecture (abstract_cvae.py:22-92), assigns this framework's weights into
them (layouts map 1:1 — see tf_import.py), and writes the reference's log-dir
ABI: ``encoder/`` + ``decoder/`` SavedModels + ``config.yml``
(reference train.py:127-128). A model trained here can then be served or
analyzed by reference-side TF tooling.

Requires TensorFlow at export time (clear error otherwise). Note: the export
is a plain ``tf.saved_model.save`` (inference signatures + variables) — under
TF>=2.16/Keras 3 this is the supported SavedModel surface; reference code
that calls ``tf.keras.models.load_model`` on TF<2.11 reads its own Keras-2
SavedModels, while this export is consumed via ``tf.saved_model.load`` (or
re-imported here, which test_tf_export.py proves is lossless).
"""

from __future__ import annotations

import os
from typing import List, Tuple


def build_reference_models(config: dict):
    """TF/Keras encoder+decoder with the reference's exact architecture
    (abstract_cvae.py:22-92): stride-2 3x3 SAME relu convs -> flatten ->
    [dense] -> dense(2*latent); dense(relu) -> reshape -> stride-2 3x3 SAME
    relu Conv2DTranspose stack -> stride-1 output Conv2DTranspose."""
    import keras

    size = config["data"]["image_size"]
    latent = int(config["model"]["latent_dimensions"])
    layers_cfg = list(config["model"]["layers"])
    edf = config["model"].get("encoder_dense_filters")

    enc_layers = [keras.layers.InputLayer(tuple(size))]
    for f in layers_cfg:
        enc_layers.append(
            keras.layers.Conv2D(f, 3, strides=(2, 2), padding="same", activation="relu")
        )
    enc_layers.append(keras.layers.Flatten())
    if edf:
        enc_layers.append(keras.layers.Dense(int(edf)))
    enc_layers.append(keras.layers.Dense(2 * latent))
    encoder = keras.Sequential(enc_layers, name="encoder")

    n = len(layers_cfg)
    dw, dh = size[0] // 2**n, size[1] // 2**n
    ddf = int(config["model"]["decoder_dense_filters"])
    dec_layers = [
        keras.layers.InputLayer((latent,)),
        keras.layers.Dense(dw * dh * ddf, activation="relu"),
        keras.layers.Reshape((dw, dh, ddf)),
    ]
    for f in reversed(layers_cfg):
        dec_layers.append(
            keras.layers.Conv2DTranspose(f, 3, strides=2, padding="same", activation="relu")
        )
    dec_layers.append(keras.layers.Conv2DTranspose(size[2], 3, strides=1, padding="same"))
    decoder = keras.Sequential(dec_layers, name="decoder")
    return encoder, decoder


def _ordered_weights(flax_tree: dict, layer_names: List[str]):
    """Flatten the flax layer dicts into Keras set_weights order
    ([kernel, bias] per weighted layer, network order)."""
    import numpy as np

    out = []
    for name in layer_names:
        layer = flax_tree[name]
        out.append(np.asarray(layer["kernel"], np.float32))
        out.append(np.asarray(layer["bias"], np.float32))
    return out


def export_tf_checkpoint(log_dir: str, out_dir: str) -> Tuple[str, str]:
    """Convert one of our log dirs into the reference's SavedModel layout.

    Returns (encoder_path, decoder_path).
    """
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "export_tf_checkpoint requires tensorflow to build the SavedModels"
        ) from e

    import jax

    from trustedai_cl_vae_ad_tpu.config import load_config, save_config
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory
    from trustedai_cl_vae_ad_tpu.train.tf_import import (
        _decoder_layer_names,
        _encoder_layer_names,
    )

    model, config = load_model_from_directory(log_dir)  # restores params
    params = jax.device_get(model.params)

    encoder, decoder = build_reference_models(config)
    encoder.set_weights(_ordered_weights(params["encoder"], _encoder_layer_names(config)))
    decoder.set_weights(_ordered_weights(params["decoder"], _decoder_layer_names(config)))

    os.makedirs(out_dir, exist_ok=True)
    enc_path = os.path.join(out_dir, "encoder")
    dec_path = os.path.join(out_dir, "decoder")
    tf.saved_model.save(encoder, enc_path)
    tf.saved_model.save(decoder, dec_path)
    save_config(load_config(os.path.join(log_dir, "config.yml"))
                if os.path.exists(os.path.join(log_dir, "config.yml")) else config,
                os.path.join(out_dir, "config.yml"))
    return enc_path, dec_path
