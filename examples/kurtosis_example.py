#!/usr/bin/env python3
"""Moment-statistics demo on the framework's own fused reduction.

Covers the reference demo's ground (examples/kurtosis_example.py: sample a
distribution, look at per-dimension skew/kurtosis) but exercises THIS
framework's compute path instead of re-deriving it in numpy: the per-dim
moments come from ``ops/moments.perdim_moments`` — the same fused kernel the
KurtosisSingle loss trains against — and are checked against each
distribution's analytic values. That makes the demo double as a numerics
sanity check for the op the losses depend on.

Analytic targets (excess-free kurtosis E[z^4], the convention the losses
use): uniform 9/5, normal 3, gamma(k) 3 + 6/k, exponential 9.

Usage: python examples/kurtosis_example.py [-n 10000] [-d 32]
       [--distribution uniform|normal|gamma|exponential] [-o hist.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# distribution -> (sampler, analytic skew, analytic kurtosis)
GAMMA_K = 255.0
DISTRIBUTIONS = {
    "uniform": (lambda rng, n, d: rng.uniform(0.0, 1.0, (n, d)), 0.0, 9 / 5),
    "normal": (lambda rng, n, d: rng.normal(0.0, 1.0, (n, d)), 0.0, 3.0),
    "gamma": (lambda rng, n, d: rng.gamma(GAMMA_K, 0.25, (n, d)),
              2 / np.sqrt(GAMMA_K), 3 + 6 / GAMMA_K),
    "exponential": (lambda rng, n, d: rng.exponential(1.0, (n, d)), 2.0, 9.0),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-samples", "-n", type=int, default=10_000)
    parser.add_argument("--dimensions", "-d", type=int, default=32)
    parser.add_argument("--distribution", choices=sorted(DISTRIBUTIONS),
                        default="uniform")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", "-o", type=str, default="kurtosis_example.png")
    args = parser.parse_args()
    assert args.num_samples > 1 and args.dimensions > 0

    sampler, want_skew, want_kurt = DISTRIBUTIONS[args.distribution]
    x = sampler(np.random.RandomState(args.seed),
                args.num_samples, args.dimensions).astype(np.float32)

    # the framework's fused per-dim reduction (Pallas on TPU, jnp fallback
    # elsewhere) — one pass produces all four moments
    from trustedai_cl_vae_ad_tpu.ops.moments import perdim_moments

    mean, var, skew, kurt = (np.asarray(m) for m in perdim_moments(x))

    header = f"{args.distribution}, N={args.num_samples}, d={args.dimensions}"
    print(header)
    print(f"{'moment':<10}{'min':>12}{'median':>12}{'max':>12}{'analytic':>12}")
    for name, vals, want in [("mean", mean, None), ("var", var, None),
                             ("skew", skew, want_skew),
                             ("kurtosis", kurt, want_kurt)]:
        tgt = f"{want:12.4f}" if want is not None else " " * 12
        print(f"{name:<10}{vals.min():12.4f}{np.median(vals):12.4f}"
              f"{vals.max():12.4f}{tgt}")
    # sampling error of the kurtosis estimator shrinks ~1/sqrt(N); 10k
    # samples land within a few percent of the analytic value
    spread = abs(np.median(kurt) - want_kurt) / want_kurt
    print(f"kurtosis median within {100 * spread:.1f}% of analytic "
          f"{want_kurt:.3f} — this is the statistic the KurtosisSingle loss "
          f"drives toward config['loss']['kurtosis'] (uniform target 1.8)")

    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fig, (ax_h, ax_k) = plt.subplots(1, 2, figsize=(10, 4))
    for i in range(min(x.shape[1], 64)):
        ax_h.hist(x[:, i], bins="auto", alpha=0.2)
    ax_h.set_title(f"per-dim sample histograms ({header})")
    ax_k.bar(np.arange(kurt.size), kurt, width=0.9)
    ax_k.axhline(want_kurt, color="k", linestyle="--",
                 label=f"analytic {want_kurt:.2f}")
    ax_k.set_title("per-dim kurtosis vs analytic")
    ax_k.legend()
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"figure -> {args.output}")


if __name__ == "__main__":
    main()
