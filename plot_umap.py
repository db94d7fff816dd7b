#!/usr/bin/env python3
"""CLI: 2-D embedding of the latent space (UMAP, with PCA fallback).

Parity with reference plot_umap.py:34-136: encode full train+val latents,
optional standardization, fit a 2-D embedding, scatter train vs val, and an
optional 10x10 inverse-transform decode grid (--interpolate). The reference
notes UMAP inverse_transform as broken upstream (:105); umap-learn is absent
in this environment, so a PCA embedder with the same fit/transform/
inverse_transform API is the default backend (exact inverses, which makes the
interpolation grid actually work); UMAP is used when importable.
"""

import argparse

import numpy as np


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", type=str, help="Log Directory containing model and config")
    parser.add_argument("--output-path", "-o", type=str, default="umap_plot.png")
    parser.add_argument("--n-neighbors", "-n", type=int, default=15)
    parser.add_argument("--min-distance", "-d", type=float, default=0.1)
    parser.add_argument("--metric", "-m", type=str, default="euclidean")
    parser.add_argument("--standardize", "-s", action="store_true")
    parser.add_argument("--interpolate", "-i", action="store_true", help="Plot interpolation grid")
    parser.add_argument(
        "--interpolation-output-filename", "-t", type=str, default="umap_interp.png"
    )
    return parser.parse_args()


class PCAEmbedder:
    """2-D PCA with the UMAP fit/transform/inverse_transform surface."""

    def __init__(self, **_kwargs):
        from sklearn.decomposition import PCA

        self._pca = PCA(n_components=2)

    def fit(self, z):
        self._pca.fit(z)
        return self

    def transform(self, z):
        return self._pca.transform(z)

    def inverse_transform(self, e):
        return self._pca.inverse_transform(e)


def make_embedder(n_neighbors, min_distance, metric):
    try:
        from umap import UMAP  # type: ignore

        return UMAP(
            n_neighbors=n_neighbors, n_components=2, min_dist=min_distance, metric=metric,
            verbose=True,
        ), "UMAP"
    except ImportError:
        print("umap-learn not available; using PCA embedder fallback")
        return PCAEmbedder(), "PCA"


def encode_all(model, split):
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.data.loader import iter_images

    zs = []
    for img in iter_images(split):
        # no f32 pre-cast: call_detailed handles the uint8 contract itself
        # (raw 0-255 pixels normalize on device; floats pass through)
        zs.append(np.asarray(model.call_detailed(jnp.asarray(img))[1]))
    return np.concatenate(zs, axis=0)


def plot_umap(data, model, output_path, n_neighbors, min_distance, metric="euclidean",
              standardized_flag=False):
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    z_train = encode_all(model, data["train"])
    z_val = encode_all(model, data["val"]) if data.get("val") is not None else z_train[:0]

    stats = None
    if standardized_flag:
        print("Standardize latent space")
        z_mean = np.mean(z_train, axis=0)
        z_std = np.std(z_train, axis=0)
        z_std[z_std == 0] = 1.0
        z_train = (z_train - z_mean) / z_std
        if len(z_val):
            z_val = (z_val - z_mean) / z_std
        stats = {"mean": z_mean, "std": z_std}

    embedder, name = make_embedder(n_neighbors, min_distance, metric)
    embedder.fit(z_train)
    train_embeddings = embedder.transform(z_train)
    val_embeddings = embedder.transform(z_val) if len(z_val) else z_val

    fig, ax = plt.subplots(1, 1)
    fig.suptitle(
        f"{name} Embeddings: Metric: {metric}, Standardized: {standardized_flag}\n"
        f"Latent Dim: {z_train.shape[1]}, N-Neighbors: {n_neighbors}, Min Dist: {min_distance}"
    )
    ax.scatter(train_embeddings[:, 0], train_embeddings[:, 1], label="training", s=5)
    if len(val_embeddings):
        ax.scatter(val_embeddings[:, 0], val_embeddings[:, 1], label="validation", s=5)
    ax.legend()
    ax.grid()
    fig.savefig(output_path)
    plt.close(fig)
    return embedder, train_embeddings, val_embeddings, stats


def plot_interpolation(model, embedder, train_embeddings, val_embeddings, embedding_stats,
                       output_filename):
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    max_values = np.max(train_embeddings, axis=0)
    min_values = np.min(train_embeddings, axis=0)
    xs = np.linspace(min_values[0], max_values[0], 10)
    ys = np.linspace(min_values[1], max_values[1], 10)
    samples = np.array([[x, y] for x in xs for y in ys], dtype=np.float32)

    z = embedder.inverse_transform(samples)
    if embedding_stats:
        z = z * embedding_stats["std"] + embedding_stats["mean"]
    reconstructions = np.asarray(model.decode(z.astype(np.float32), apply_sigmoid=True))

    fig, ax = plt.subplots(10, 10)
    for i in range(10):
        for j in range(10):
            ax[i][j].imshow(np.clip(reconstructions[i * 10 + j], 0, 1))
            ax[i][j].axis("off")
    fig.savefig(output_filename, bbox_inches="tight")
    plt.close(fig)


def main():
    args = get_args()

    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.log_dir)
    data = load_data(config)
    embedder, train_emb, val_emb, stats = plot_umap(
        data, model, args.output_path, args.n_neighbors, args.min_distance, args.metric,
        args.standardize,
    )
    if args.interpolate:
        plot_interpolation(model, embedder, train_emb, val_emb, stats,
                           args.interpolation_output_filename)


if __name__ == "__main__":
    main()
