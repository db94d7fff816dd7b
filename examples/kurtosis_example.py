#!/usr/bin/env python3
"""Numpy sanity check of the batch moment statistics.

Parity with reference examples/kurtosis_example.py:10-47: draw N x d samples,
compute per-dimension mean/std/skew/kurtosis, print them, and plot per-dim
histograms (saved to a file; no interactive display needed).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-samples", "-n", type=int, default=10_000)
    parser.add_argument("--dimensions", "-d", type=int, default=32)
    parser.add_argument("--distribution", choices=["uniform", "normal", "gamma"], default="uniform")
    parser.add_argument("--output", "-o", type=str, default="kurtosis_example.png")
    args = parser.parse_args()

    assert args.num_samples > 0
    assert args.dimensions > 0

    N, d = args.num_samples, args.dimensions
    if args.distribution == "uniform":
        x = np.random.uniform(0.0, 1.0, size=(N, d))  # kurtosis -> 1.8
    elif args.distribution == "normal":
        x = np.random.normal(0.0, 1.0, size=(N, d))  # kurtosis -> 3.0
    else:
        x = np.random.gamma(255.0, 0.25, size=(N, d))

    meu = np.mean(x, axis=0)
    std = np.std(x, axis=0)
    z = (x - meu) / std
    skew = np.mean(z**3, axis=0)
    kurt = np.mean(z**4, axis=0)

    print(f"Mean: \n{meu}")
    print(f"Std.Dev: \n{std}")
    print(f"Skew: \n{skew}")
    print(f"Kurt: \n{kurt}")

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    for i in range(x.shape[1]):
        plt.hist(x[:, i], bins="auto", alpha=0.25)
    plt.savefig(args.output)
    print(f"histograms -> {args.output}")


if __name__ == "__main__":
    main()
