#!/usr/bin/env python3
"""CLI: J-diagram (latent attribute arithmetic) figure.

Parity with reference plot_j_diagram.py:40-138: encode images A/B/C, form
attribute vectors zBA = zB - zA and zCA = zC - zA, decode the grid
z = t0*zBA + t1*zCA + zA over t in [0,1]^2, render an (N+1)x(N+1) figure with
Source / Attr.1 / Attr.2 corners.
"""

import argparse
import os

import numpy as np


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", type=str, help="Log Directory containing model and config")
    parser.add_argument("img_a", type=str, help="Source image A")
    parser.add_argument("img_b", type=str, help="Attribute-1 image B")
    parser.add_argument("img_c", type=str, help="Attribute-2 image C")
    parser.add_argument("--output-filename", "-o", type=str, default="j_diagram.png")
    parser.add_argument("--grid-size", "-n", type=int, default=11)
    return parser.parse_args()


def load_images(paths, config: dict) -> np.ndarray:
    from PIL import Image

    from trustedai_cl_vae_ad_tpu.data.ingest import preprocess_batch

    # each image is resized to the model input INDIVIDUALLY (reference
    # plot_j_diagram.py:65-68): attribute images normally come from different
    # sources/resolutions, so stacking before the resize would crash
    out = []
    for p in paths:
        assert os.path.isfile(p), p
        img = np.asarray(Image.open(p).convert("RGB"))
        out.append(np.asarray(preprocess_batch(img[None], config["data"]["image_size"])))
    return np.concatenate(out, axis=0)


def plot_j_diagram(model, imgs: np.ndarray, output_filename: str, N: int = 11):
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(imgs)
    if imgs.dtype == np.uint8:
        # uint8 contract: raw 0-255 pixels (imgs are also rendered below)
        imgs = imgs.astype(np.float32) / 255.0
    _, z, _, _ = model.call_detailed(jnp.asarray(imgs, jnp.float32))
    z = np.asarray(z)
    z0 = z[0]
    zba = z[1] - z[0]
    zca = z[2] - z[0]

    t_vec = np.linspace(0.0, 1.0, N)
    # decode the whole grid in ONE batched call (reference decodes per cell)
    grid_z = np.stack(
        [t0 * zba + t1 * zca + z0 for t0 in t_vec for t1 in t_vec]
    ).astype(np.float32)
    grid_imgs = np.asarray(model.decode(grid_z, apply_sigmoid=True))

    fig, ax = plt.subplots(N + 1, N + 1, figsize=(1.2 * (N + 1), 1.2 * (N + 1)))
    fig.suptitle("J-Diagram")
    ax[0][0].imshow(np.clip(imgs[0], 0, 1))
    ax[0][0].set_title("Source")
    ax[0][-1].imshow(np.clip(imgs[1], 0, 1))
    ax[0][-1].set_title("Attr. 1")
    ax[-1][0].imshow(np.clip(imgs[2], 0, 1))
    ax[-1][0].set_title("Attr. 2")

    for i in range(N):
        for j in range(N):
            ax[j + 1][i + 1].imshow(np.clip(grid_imgs[i * N + j], 0, 1))
    for row in ax:
        for a in row:
            a.axis("off")
    plt.subplots_adjust(wspace=0, hspace=0)
    print(f"Saving J-Diagram: {output_filename}")
    fig.savefig(output_filename, bbox_inches="tight")
    plt.close(fig)


def main():
    args = get_args()

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.log_dir)
    imgs = load_images([args.img_a, args.img_b, args.img_c], config)
    plot_j_diagram(model, imgs, args.output_filename, args.grid_size)


if __name__ == "__main__":
    main()
