#!/usr/bin/env python3
"""CLI: convert a reference TF SavedModel log dir into this framework's
checkpoint format.

    python tools/import_tf_checkpoint.py <ref_logdir> <out_logdir> [--verify]

<ref_logdir> is a reference-style directory: encoder/ + decoder/ Keras
SavedModels + config.yml (reference train.py:127-128). <out_logdir> receives
the same config.yml plus an Orbax checkpoint loadable by every tool here
(registry.load_model_from_directory). --verify additionally runs the TF model
(requires tensorflow) and asserts reconstruction MSE < 1e-5 on a random batch
— the BASELINE.json parity target.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ref_dir", help="Reference log dir (encoder/ decoder/ config.yml)")
    parser.add_argument("out_dir", help="Output log dir for the converted checkpoint")
    parser.add_argument("--verify", action="store_true",
                        help="Run the TF model too and assert <1e-5 reconstruction MSE")
    args = parser.parse_args()

    from trustedai_cl_vae_ad_tpu.config import save_config
    from trustedai_cl_vae_ad_tpu.train.tf_import import import_tf_checkpoint

    model, config = import_tf_checkpoint(args.ref_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    model.save_model(args.out_dir, include_optimizer=False)
    save_config(config, os.path.join(args.out_dir, "config.yml"))
    print(f"Imported TF checkpoint {args.ref_dir} -> {args.out_dir}")

    if args.verify:
        import numpy as np

        import tensorflow as tf

        size = config["data"]["image_size"]
        x = np.random.RandomState(0).random((2, size[0], size[1], size[2])).astype(np.float32)
        enc = tf.saved_model.load(os.path.join(args.ref_dir, "encoder"))
        dec = tf.saved_model.load(os.path.join(args.ref_dir, "decoder"))
        enc_fn = enc.signatures.get("serving_default") or next(iter(enc.signatures.values()))
        tf_latent = list(enc_fn(tf.constant(x)).values())[0].numpy()
        mean_logvar = model.encode(x)
        ours_latent = np.concatenate([np.asarray(m) for m in mean_logvar], axis=1)
        mse_latent = float(np.mean((tf_latent - ours_latent) ** 2))
        mean = tf_latent[:, : tf_latent.shape[1] // 2]
        dec_fn = dec.signatures.get("serving_default") or next(iter(dec.signatures.values()))
        tf_rec = list(dec_fn(tf.constant(mean)).values())[0].numpy()
        ours_rec = np.asarray(model.decode(mean, apply_sigmoid=False))
        mse_rec = float(np.mean((tf_rec - ours_rec) ** 2))
        print(f"verify: latent MSE {mse_latent:.3e}, reconstruction MSE {mse_rec:.3e}")
        assert mse_rec < 1e-5 and mse_latent < 1e-5, "parity target missed"
        print("parity OK (<1e-5)")


if __name__ == "__main__":
    main()
