#!/usr/bin/env python3
"""CLI: pairwise latent-space similarity analysis.

Parity with reference similarity_analysis.py:40-214: encode the train split
with filepaths, standardize latents, full pairwise euclidean + cosine distance
matrices, nested file->file->{euclidean, cosine} distances.json, a 2x2 summary
figure (distance histograms + latent histograms), and per-latent-dim histogram
PNGs annotated with mean/std/kurtosis.
"""

import argparse
import json
import os
import shutil
from collections import defaultdict

import numpy as np


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", "-m", required=True, type=str)
    parser.add_argument("--dataset-dir", "-d", required=True, type=str)
    parser.add_argument("--output-dir", "-o", type=str, default=None,
                        help="Override output path")
    parser.add_argument("--force", "-f", action="store_true")
    args = parser.parse_args()

    # reference semantics (similarity_analysis.py:32-56): output lands in
    # <output_dir or model_dir>/similarity
    base = args.output_dir if args.output_dir else args.model_dir
    sim_dir = os.path.join(base, "similarity")
    if not args.force:
        assert not os.path.exists(sim_dir), f"output exists (use --force): {sim_dir}"
        os.makedirs(sim_dir)
    else:
        if os.path.exists(sim_dir):
            assert not os.path.isfile(sim_dir)
            shutil.rmtree(sim_dir)
        os.makedirs(sim_dir, exist_ok=True)
    return args.model_dir, args.dataset_dir, sim_dir


def similarity_analysis(model, config: dict, data: dict, sim_dir: str) -> None:
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import pairwise_distances

    z_samples = []
    filepaths = []
    if "train_full" in data:
        # single-pass {'image','filepath'} stream (loader 'train_full'):
        # zipping data['train'] with data['train_labels'] would run TWO full
        # decode passes over the split concurrently — the raite loader always
        # provides train_full alongside train_labels (data/loader.py), so no
        # zip fallback exists here
        pairs = ((b["image"], b["filepath"]) for b in data["train_full"])
    else:
        def _pairs():
            # batches without a 'filepath' key (e.g. the tfds catalog branch)
            # get synthesized stable identifiers instead of a KeyError
            idx = 0
            for b in data["train"]:
                img = b["image"] if isinstance(b, dict) else b
                if isinstance(b, dict) and "filepath" in b:
                    fps = b["filepath"]
                else:
                    fps = [f"item_{idx + j:06d}" for j in range(len(img))]
                idx += len(img)
                yield img, fps

        pairs = _pairs()
    for batch_img, batch_filepath in pairs:
        # no f32 pre-cast: call_detailed handles the uint8 contract itself
        _, z, _, _ = model.call_detailed(jnp.asarray(batch_img))
        z_samples.append(np.asarray(z))
        filepaths.extend(str(p) for p in batch_filepath)
    z_samples = np.concatenate(z_samples, axis=0)

    print("Standardize latent space")
    latent_means = np.mean(z_samples, axis=0)
    latent_stds = np.std(z_samples, axis=0)
    latent_stds_safe = np.where(latent_stds == 0, 1.0, latent_stds)
    z_scores = (z_samples - latent_means) / latent_stds_safe

    euclidean_distance = pairwise_distances(z_scores, metric="euclidean")
    flat_euclidean = euclidean_distance[np.triu_indices_from(euclidean_distance, k=1)]
    cosine_distance = pairwise_distances(z_scores, metric="cosine")
    flat_cosine = cosine_distance[np.triu_indices_from(cosine_distance, k=1)]

    lookup = defaultdict(lambda: defaultdict(dict))
    for idx_1, f1 in enumerate(filepaths):
        for idx_2, f2 in enumerate(filepaths):
            if idx_1 <= idx_2:
                continue
            lookup[f1][f2]["euclidean"] = float(euclidean_distance[idx_1, idx_2])
            lookup[f1][f2]["cosine"] = float(cosine_distance[idx_1, idx_2])
    distances_path = os.path.join(sim_dir, "distances.json")
    print(f"Saving distances to file: {distances_path}")
    with open(distances_path, "w") as ofile:
        json.dump(lookup, ofile)

    print("Generating plots")
    fig, ((ax_euc, ax_full), (ax_cos, ax_each)) = plt.subplots(2, 2)
    fig.suptitle("Distance Metrics and Latent Space Histograms")
    ax_euc.hist(flat_euclidean, bins="auto", density=True)
    ax_euc.set_title("Euclidean Distance Histogram")
    ax_euc.set_xlabel("Euclidean Distance")
    ax_euc.set_ylabel("Density")
    ax_euc.grid()
    ax_cos.hist(flat_cosine, bins="auto", density=True)
    ax_cos.set_title("Cosine Distance Histogram")
    ax_cos.set_xlabel("Cosine Distance")
    ax_cos.set_ylabel("Density")
    ax_cos.grid()
    ax_full.hist(z_samples.flatten(), bins="auto", density=True)
    ax_full.set_title("Full Z Histogram")
    ax_full.set_xlabel("Latent Space Value")
    ax_full.set_ylabel("Density")
    ax_full.grid()
    for idx in range(z_samples.shape[1]):
        ax_each.hist(z_samples[:, idx], bins="auto", density=True, alpha=0.35)
    ax_each.set_title(f"Individual Z-vec Histogram: {z_samples.shape[1]}")
    ax_each.set_xlabel("Latent Space Value")
    ax_each.set_ylabel("Density")
    ax_each.grid()
    plt.tight_layout()
    fig.savefig(os.path.join(sim_dir, "similarity_figure.png"))
    plt.close(fig)

    for idx in range(z_samples.shape[1]):
        col = z_samples[:, idx]
        mean = np.mean(col)
        std = np.std(col)
        zc = (col - mean) / (std if std > 0 else 1.0)
        kurtosis = float(np.mean(zc**4))
        z_fig, ax = plt.subplots(1, 1)
        z_fig.suptitle(
            f"Latent Element #:{idx} Histogram \n"
            f"N= {len(col)}, Mean= {mean:0.3f}, Std.Dev= {std:0.3f}, Kurtosis= {kurtosis:0.3f}"
        )
        ax.hist(col, bins="auto", density=True)
        ax.set_xlabel("Latent Space Value")
        ax.set_ylabel("Density")
        ax.grid()
        z_fig.savefig(os.path.join(sim_dir, f"latent_hist_{idx:03d}.png"))
        plt.close(z_fig)


def main():
    model_dir, dataset_dir, output_dir = get_args()

    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(model_dir)
    config["data"]["dataset_path"] = dataset_dir
    data = load_data(config)
    similarity_analysis(model, config, data, output_dir)


if __name__ == "__main__":
    main()
