#!/usr/bin/env python3
"""Direct gradient descent of the per-dimension moment losses on a raw tensor.

Parity with reference examples/kurtosis_single_example.py:12-76 (which used a
tf.Variable + GradientTape): validates that the kurtosis/skew/mean regularizer
combination is optimizable before wiring it into the VAE. JAX-native: the loss
is a pure function, the descent loop is a jitted update step.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--latent-variables", "-l", type=int, default=32)
    parser.add_argument("--batch-size", "-b", type=int, default=16)
    parser.add_argument("--num-steps", "-n", type=int, default=200)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--target-kurtosis", "-t", type=float, default=3.0)
    parser.add_argument("--gaussian-init", action="store_true")
    parser.add_argument("--output", "-o", type=str, default="kurtosis_single_example.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.moments import perdim_moments

    key = jax.random.PRNGKey(0)
    shape = (args.batch_size, args.latent_variables)
    if args.gaussian_init:
        centers = 2.0 * jax.random.normal(key, (args.latent_variables,))
        x = centers[None, :] + jax.random.normal(jax.random.fold_in(key, 1), shape)
    else:
        x = jax.random.uniform(key, shape)

    target = args.target_kurtosis
    lr = args.learning_rate

    def loss_fn(x, rng):
        eps = x + 1e-5 * jax.random.normal(rng, x.shape)
        meu, _var, skew, kurtosis = perdim_moments(eps)
        kurtosis_mean = jnp.mean((kurtosis - target) ** 2)
        skew_mean = jnp.mean(skew**2)
        mean_loss = jnp.sqrt(jnp.sum(meu**2))
        aux = (jnp.min(kurtosis), jnp.max(kurtosis), jnp.mean(kurtosis), mean_loss, skew_mean)
        return kurtosis_mean + mean_loss + skew_mean, aux

    @jax.jit
    def step(x, rng):
        (loss, aux), grad = jax.value_and_grad(loss_fn, has_aux=True)(x, rng)
        return x - lr * grad, loss, aux

    for epoch in range(args.num_steps):
        key, sub = jax.random.split(key)
        x, loss, (kmin, kmax, kmean, mean_loss, skew_mean) = step(x, sub)
        if epoch % 20 == 0 or epoch == args.num_steps - 1:
            print(
                f"Epoch: {epoch}, Min Kurtosis: {float(kmin):0.6f}, Max Kurtosis: "
                f"{float(kmax):0.6f}, Mean Kurtosis: {float(kmean):0.6f}, Mean: "
                f"{float(mean_loss):0.6f}, Skew: {float(skew_mean):0.6f} Loss: {float(loss):0.6f}"
            )

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1)
    fig.suptitle(
        f"Kurtosis Target: {target}, # Lat. Var.: {args.latent_variables}, "
        f"Batch Size: {args.batch_size}"
    )
    x_np = np.asarray(x)
    for idx in range(x_np.shape[1]):
        ax.hist(x_np[:, idx], bins="auto", alpha=0.35, density=True)
    ax.set_xlabel("Latent Value")
    ax.set_ylabel("Density")
    fig.savefig(args.output)
    print(f"final histograms -> {args.output}")


if __name__ == "__main__":
    main()
