#!/usr/bin/env python3
"""SLERP spherical-interpolation demo between two random unit vectors.

Parity with reference examples/arc_walk.py:7-104: normalize two random
vectors, compute the great-circle angle, walk the arc with spherical linear
interpolation, verify every step stays unit-norm, and plot the trajectory
against linear interpolation.
"""

import argparse

import numpy as np


def vec_mag(x):
    return np.sqrt(np.sum(np.power(x, 2)))


def slerp(theta, t, x1, x2):
    a = (np.sin((1.0 - t) * theta) / np.sin(theta)) * x1
    b = (np.sin(t * theta) / np.sin(theta)) * x2
    return a + b


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-samples", "-n", type=int, default=50)
    parser.add_argument("--num-dims", "-d", type=int, default=3)
    parser.add_argument("--output", "-o", type=str, default="arc_walk.png")
    args = parser.parse_args()

    num_dims = args.num_dims
    assert num_dims >= 3

    rng = np.random.RandomState(0)
    x1 = 2 * rng.random(num_dims) - 1
    x2 = 2 * rng.random(num_dims) - 1
    x1 = x1 / vec_mag(x1)
    x2 = x2 / vec_mag(x2)

    dot_prod = float(np.dot(x1, x2))
    theta = np.arccos(np.clip(dot_prod, -1.0, 1.0))
    print(f"X1: {x1}")
    print(f"X2: {x2}")
    print(f"Cos(theta): {dot_prod}")
    print(f"Theta: {theta}, {np.degrees(theta)} deg")

    t_vec = np.linspace(0.0, 1.0, args.num_samples)
    arc = np.stack([slerp(theta, t, x1, x2) for t in t_vec])
    lin = np.stack([(1 - t) * x1 + t * x2 for t in t_vec])

    mags = np.sqrt(np.sum(arc**2, axis=1))
    print(f"slerp magnitude range: [{mags.min():.6f}, {mags.max():.6f}] (should be ~1)")
    assert np.allclose(mags, 1.0, atol=1e-6)

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot(arc[:, 0], arc[:, 1], arc[:, 2], label="slerp (arc)")
    ax.plot(lin[:, 0], lin[:, 1], lin[:, 2], label="lerp (chord)")
    ax.scatter(*x1[:3], color="green", label="x1")
    ax.scatter(*x2[:3], color="red", label="x2")
    ax.legend()
    fig.savefig(args.output)
    print(f"trajectory -> {args.output}")


if __name__ == "__main__":
    main()
