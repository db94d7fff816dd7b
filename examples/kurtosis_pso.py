#!/usr/bin/env python3
"""Particle-swarm search for sample sets matching a target kurtosis.

Capability parity with reference examples/kurtosis_pso.py:9-247 (which looped
over particles in Python): find a (batch, dims) tensor whose per-dimension
kurtosis matches the target (1.8 ~ uniform, 3.0 ~ normal, 6.0 ~ Laplace).
JAX-native: the whole swarm is one array, fitness is vmapped, and the PSO
update is a single jitted step — no Python-level particle loop.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-particles", "-p", type=int, default=64)
    parser.add_argument("--batch-size", "-b", type=int, default=64)
    parser.add_argument("--dims", "-d", type=int, default=8)
    parser.add_argument("--target-kurtosis", "-t", type=float, default=1.8)
    parser.add_argument("--num-steps", "-n", type=int, default=300)
    parser.add_argument("--inertia", type=float, default=0.72)
    parser.add_argument("--cognitive", type=float, default=1.49)
    parser.add_argument("--social", type=float, default=1.49)
    parser.add_argument("--output", "-o", type=str, default="kurtosis_pso.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.moments import perdim_moments

    target = args.target_kurtosis
    P, B, D = args.num_particles, args.batch_size, args.dims

    def fitness(x):  # x: (B, D) -> scalar (lower is better)
        meu, _var, skew, kurt = perdim_moments(x)
        return jnp.mean((kurt - target) ** 2) + jnp.mean(skew**2) + jnp.mean(meu**2)

    fitness_v = jax.vmap(fitness)

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    pos = jax.random.normal(k1, (P, B, D))
    vel = 0.1 * jax.random.normal(k2, (P, B, D))

    fit = fitness_v(pos)
    best_pos = pos
    best_fit = fit
    gbest_idx = jnp.argmin(fit)
    gbest_pos = pos[gbest_idx]
    gbest_fit = fit[gbest_idx]

    w, c1, c2 = args.inertia, args.cognitive, args.social

    @jax.jit
    def pso_step(state, rng):
        pos, vel, best_pos, best_fit, gbest_pos, gbest_fit = state
        r1 = jax.random.uniform(rng, pos.shape)
        r2 = jax.random.uniform(jax.random.fold_in(rng, 1), pos.shape)
        vel = (
            w * vel
            + c1 * r1 * (best_pos - pos)
            + c2 * r2 * (gbest_pos[None] - pos)
        )
        pos = pos + vel
        fit = fitness_v(pos)
        improved = fit < best_fit
        best_pos = jnp.where(improved[:, None, None], pos, best_pos)
        best_fit = jnp.where(improved, fit, best_fit)
        idx = jnp.argmin(best_fit)
        new_gbest_fit = best_fit[idx]
        better = new_gbest_fit < gbest_fit
        gbest_pos = jnp.where(better, best_pos[idx], gbest_pos)
        gbest_fit = jnp.where(better, new_gbest_fit, gbest_fit)
        return (pos, vel, best_pos, best_fit, gbest_pos, gbest_fit)

    state = (pos, vel, best_pos, best_fit, gbest_pos, gbest_fit)
    for step in range(args.num_steps):
        key, sub = jax.random.split(key)
        state = pso_step(state, sub)
        if step % 25 == 0 or step == args.num_steps - 1:
            print(f"step {step}: global best fitness = {float(state[5]):.6f}")

    gbest = np.asarray(state[4])
    _, _, skew, kurt = perdim_moments(jnp.asarray(gbest))
    print(f"target kurtosis: {target}")
    print(f"achieved per-dim kurtosis: {np.asarray(kurt).round(3)}")
    print(f"achieved per-dim skew: {np.asarray(skew).round(3)}")

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1)
    fig.suptitle(f"PSO best swarm member: target kurtosis {target}")
    for idx in range(gbest.shape[1]):
        ax.hist(gbest[:, idx], bins="auto", alpha=0.35, density=True)
    ax.set_xlabel("Value")
    ax.set_ylabel("Density")
    fig.savefig(args.output)
    print(f"histograms -> {args.output}")


if __name__ == "__main__":
    main()
