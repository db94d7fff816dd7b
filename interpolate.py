#!/usr/bin/env python3
"""CLI: latent-space linear interpolation grid.

Parity with reference interpolate.py:29-121: encode 2N images from the
config's dataset, walk z0 -> z1 in k steps of (z1-z0)/k, decode each step
with sigmoid, render an N x (k+2) grid PNG with X0/t_i/X1 titles.
"""

import argparse

import numpy as np


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", type=str, help="Log Directory containing model and config")
    parser.add_argument("--sample-points", "-k", type=int, default=10, help="Number of samples to walk")
    parser.add_argument("--output-path", "-o", type=str, default="interpolate_output.png")
    return parser.parse_args()


def example_interpolate(config: dict, model, output_path: str, k_sample_points: int = 10, N: int = 10):
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    data = load_data(config)
    from trustedai_cl_vae_ad_tpu.data.loader import iter_images

    xs = []
    for img in iter_images(data["val"] if data.get("val") is not None else data["train"]):
        xs.append(np.asarray(img))
        if sum(b.shape[0] for b in xs) >= 2 * N:
            break
    x = np.concatenate(xs, axis=0)
    N = min(N, len(x) // 2)
    assert N > 0, "need at least 2 images to interpolate"
    x = x[: 2 * N]
    if x.dtype == np.uint8:
        # uint8 contract: raw 0-255 pixels (x is also rendered below)
        x = x.astype(np.float32) / 255.0

    _, z, _, _ = model.call_detailed(jnp.asarray(x, jnp.float32))
    z = np.asarray(z)
    z0, z1 = z[:N], z[N:]
    z_delta = (z1 - z0) / k_sample_points

    columns = [x[:N]]
    for t in range(k_sample_points):
        columns.append(np.asarray(model.decode(z0 + z_delta * t, apply_sigmoid=True)))
    columns.append(x[N:])

    fig, ax_vec = plt.subplots(N, len(columns), squeeze=False)
    for row in range(N):
        for col in range(len(columns)):
            ax_vec[row][col].imshow(np.clip(columns[col][row], 0, 1))
            ax_vec[row][col].axis("off")
    fs = 8
    ax_vec[0][0].set_title("X0", fontsize=fs)
    ax_vec[0][-1].set_title("X1", fontsize=fs)
    for i in range(len(columns) - 2):
        ax_vec[0][i + 1].set_title(f"t{i}", fontsize=fs)
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)


def main():
    args = get_args()

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.log_dir)
    example_interpolate(config, model, args.output_path, args.sample_points)


if __name__ == "__main__":
    main()
