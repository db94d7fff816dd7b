#!/usr/bin/env python3
"""Empirical-CDF demo on Gamma samples.

Parity with reference examples/gamma_example.py (a verbatim duplicate of
src/cdf_object.py's CLI demo): build a CDFObject over Gamma draws, print
value<->probability lookups, and run the 1000-reset timing benchmark. Here it
exercises the real library component (trustedai_cl_vae_ad_tpu.anomaly.cdf)
instead of duplicating it.
"""

import argparse

import numpy as np

from trustedai_cl_vae_ad_tpu.anomaly.cdf import CDFObject, benchmark_reset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--alpha", "-a", type=float, default=2.0, help="Gamma(Alpha, beta)")
    parser.add_argument("--beta", "-b", type=float, default=4.0, help="Gamma(alpha, Beta)")
    parser.add_argument("--num-samples", "-n", type=int, default=10000)
    args = parser.parse_args()

    x = np.random.gamma(shape=args.alpha, scale=1.0 / args.beta, size=(args.num_samples,))
    cdf = CDFObject(x)
    print(f"Hist Sum: {np.sum(cdf.hist)}")
    print(f"Mean: {cdf.meu}")

    print("Get Probability from Value")
    for a in np.linspace(0.0, 3.0, 30):
        print(f" - {a:0.03f}: {cdf.get_prob_by_value(a):0.03f}")
    print("Get Value from Probability")
    for p in np.linspace(0.0, 1.0, 10):
        print(f" - {p:0.03f}: {cdf.get_value_by_prob(p):0.03f}")
    print(f"95%: {cdf.get_value_by_prob(0.95)}")

    benchmark_reset(n=args.num_samples, alpha=args.alpha, beta=args.beta)


if __name__ == "__main__":
    main()
