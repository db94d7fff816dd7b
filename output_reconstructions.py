#!/usr/bin/env python3
"""CLI: dump originals / reconstructions / error maps / JET heatmap overlays.

Parity with reference output_reconstructions.py:40-149: for both train and
val splits writes imgs/{originals,reconstructions,errors,heatmap}/{train,val}
PNGs, per-image scalar error sqrt(sum eps) JSONs
(train/val_reconstruction_error.json), and a reconstruction-error histogram
figure. Heatmaps normalize by the split's global error min/max (reference
:73-84).

TPU-first: forward + per-pixel error reduce is one jitted program per batch;
PNG encoding fans out over a thread pool.
"""

import argparse
import concurrent.futures as cf
import json
import os

import numpy as np


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", type=str, help="Model Directory")
    return parser.parse_args()


def _save_png(path, arr):
    from trustedai_cl_vae_ad_tpu.viz.plots import save_rgb

    save_rgb(arr, path)


def process_train_val_reconstructions(log_dir: str, model, config: dict, data: dict) -> None:
    import jax
    import jax.numpy as jnp

    assert os.path.isdir(log_dir)
    core = model.core

    @jax.jit
    def fwd_err(params, x):
        x_hat = core.call(params, x, training=False)
        err_map = jnp.sum((x - x_hat) ** 2, axis=3)
        scalar_err = jnp.sqrt(jnp.sum(err_map, axis=(1, 2)))
        return x_hat, err_map, scalar_err

    def process_split(split_data, split: str) -> dict:
        """Two streamed passes, host memory O(batch) (the heatmap normalizer
        is the SPLIT-GLOBAL error min/max, reference :73-77, so no single
        pass can write heatmaps as it goes). Pass 1 writes originals +
        reconstructions and spills each error map to a float16 .npy sidecar;
        pass 2 normalizes them against the global min/max into error/heatmap
        PNGs and deletes the sidecars. Keeping the maps (and originals) in
        RAM instead is O(dataset): ~800 GB of f32 at 100k 1080p frames."""
        orig_dir = os.path.join(log_dir, f"imgs/originals/{split}")
        rec_dir = os.path.join(log_dir, f"imgs/reconstructions/{split}")
        heat_dir = os.path.join(log_dir, f"imgs/heatmap/{split}")
        err_dir = os.path.join(log_dir, f"imgs/errors/{split}")
        for d in (orig_dir, rec_dir, heat_dir, err_dir):
            os.makedirs(d, exist_ok=True)

        rec_err = {}
        img_num = 0
        emin, emax = np.inf, -np.inf
        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            futs = []
            for batch in split_data:
                x = jnp.asarray(batch["image"] if isinstance(batch, dict) else batch)
                # uint8 contract: raw 0-255 pixels (x also feeds the error
                # maps and the 255*x original dumps below)
                x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x.astype(jnp.float32)
                x_hat, err_map, scalar_err = fwd_err(model.params, x)
                x_np, xh_np, em_np, se_np = map(np.asarray, (x, x_hat, err_map, scalar_err))
                emin = min(emin, float(em_np.min()))
                emax = max(emax, float(em_np.max()))
                for i in range(len(x_np)):
                    orig_u8 = np.clip(np.round(255.0 * x_np[i]), 0, 255).astype(np.uint8)
                    rec_u8 = np.clip(np.round(255.0 * xh_np[i]), 0, 255).astype(np.uint8)
                    futs.append(pool.submit(_save_png, os.path.join(orig_dir, f"{img_num}.png"), orig_u8))
                    futs.append(pool.submit(_save_png, os.path.join(rec_dir, f"{img_num}.png"), rec_u8))
                    np.save(os.path.join(err_dir, f"{img_num}.npy"),
                            em_np[i].astype(np.float16))
                    rec_err[img_num] = float(se_np[i])
                    img_num += 1
                if len(futs) > 512:  # bound in-flight PNG encodes
                    for f in futs:
                        f.result()
                    futs = []
            for f in futs:
                f.result()

        # Pass 2: heatmaps normalized by split-global min/max (reference :73-77)
        if img_num:
            scale = (emax - emin) if emax > emin else 1.0
            from PIL import Image

            from trustedai_cl_vae_ad_tpu.viz.plots import overlay_heatmap

            with cf.ThreadPoolExecutor(max_workers=8) as pool:
                futs = []
                for k in range(img_num):
                    npy = os.path.join(err_dir, f"{k}.npy")
                    m = np.load(npy).astype(np.float32)
                    os.remove(npy)
                    err_u8 = np.clip(np.round(255.0 * (m - emin) / scale), 0, 255).astype(np.uint8)
                    futs.append(pool.submit(_save_png, os.path.join(err_dir, f"{k}.png"), err_u8))
                    orig_u8 = np.asarray(Image.open(os.path.join(orig_dir, f"{k}.png")))
                    if orig_u8.ndim == 2:
                        orig_u8 = orig_u8[..., None]
                    overlay = overlay_heatmap(err_u8, orig_u8)
                    futs.append(pool.submit(_save_png, os.path.join(heat_dir, f"{k}.png"), overlay))
                    if len(futs) > 512:
                        for f in futs:
                            f.result()
                        futs = []
                for f in futs:
                    f.result()
        return rec_err

    train_err = process_split(data["train"], "train")
    with open(os.path.join(log_dir, "train_reconstruction_error.json"), "w") as f:
        json.dump(train_err, f)
    val_err = {}
    if data.get("val") is not None:
        val_err = process_split(data["val"], "val")
        with open(os.path.join(log_dir, "val_reconstruction_error.json"), "w") as f:
            json.dump(val_err, f)

    from trustedai_cl_vae_ad_tpu.viz.plots import histogram

    series = {"train": np.asarray(list(train_err.values()))}
    if val_err:
        series["val"] = np.asarray(list(val_err.values()))
    histogram(
        os.path.join(log_dir, "reconstruction_hist.png"),
        series,
        "Reconstruction Error Histogram",
        xlabel="Reconstruction Error (MSE)",
        ylabel="Counts",
    )


def main():
    args = get_args()

    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.log_dir)
    data = load_data(config)
    process_train_val_reconstructions(args.log_dir, model, config, data)


if __name__ == "__main__":
    main()
