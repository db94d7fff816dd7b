"""Empirical-CDF threshold object (per-task anomaly thresholds).

Capability parity with reference src/cdf_object.py:6-107: histogram-based
empirical CDF with value->probability and probability->value lookups, plus the
``BSTProb`` mean-split search-tree API. The reference builds the CDF with an
O(n^2) lower-triangular mask matmul (cdf_object.py:96-98) and walks a
recursively-built Python dict tree per query; here the CDF is a cumsum and
lookups are ``np.searchsorted`` (vectorized, accepts arrays), which is what
the tree approximated. ``BSTProb`` keeps only the reference's *API* (same
constructor/getitem surface and mean-split lookup semantics) over a flat
array-backed tree built and queried iteratively.

The reference ships this component with no importers (SURVEY.md section 2 L6);
here it is wired into the continual-learning stream as the per-task threshold
mechanism (stream/engine.py) per BASELINE.json config #3.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np

ArrayLike = Union[Sequence, np.ndarray]


class BSTProb:
    """Mean-split search tree over (x, prob) pairs — API parity with
    cdf_object.py:6-77 (same constructor, ``reset``, ``[]`` lookup and
    mean-split/match_fun semantics), array-backed and iterative.

    Nodes live in flat parallel arrays (``_key``/``_prob``/``_left``/
    ``_right``); the tree is grown with an explicit worklist and queried
    with an index-chasing loop, so there is no recursion limit and no
    per-node Python dict. A leaf's key is the mean of its value subset and
    its prob is the first prob of that subset (subsets whose values are all
    equal collapse to one leaf), matching the lookup behavior of the
    reference's dict tree exactly.
    """

    _NO_CHILD = -1

    def __init__(self, x: ArrayLike, probs: ArrayLike, match_fun: Callable = None):
        self.match_fun = match_fun or (lambda a, b: a <= b)
        self.reset(x, probs)

    def reset(self, x, probs, match_fun=None):
        if match_fun is not None:
            self.match_fun = match_fun
        x = np.asarray(x)
        probs = np.asarray(probs)
        if len(x) != len(probs) or len(x) == 0:
            raise ValueError("BSTProb needs equal-length, non-empty x/probs")
        order = np.argsort(x, kind="stable")
        self.x = x[order]
        self.probs = probs[order]
        key, prob, leaf, left, right = [], [], [], [], []
        # worklist of (node_index, value_subset, prob_subset); children are
        # appended to the arrays and linked back by index. Leafness is an
        # explicit flag — a NaN-in-prob sentinel would misroute leaves whose
        # stored prob is legitimately NaN (empty histogram bins, 0/0 norms).
        pending = [(0, self.x, self.probs)]
        key.append(float(np.mean(self.x)))
        prob.append(np.nan)
        leaf.append(False)
        left.append(self._NO_CHILD)
        right.append(self._NO_CHILD)
        while pending:
            idx, vals, ps = pending.pop()
            if len(vals) == 1 or vals[0] == vals[-1]:
                prob[idx] = float(ps[0])  # leaf: all values identical
                leaf[idx] = True
                continue
            goes_left = np.asarray(self.match_fun(vals, key[idx]))
            if goes_left.all() or not goes_left.any():
                # degenerate split: np.mean rounded onto the subset's extreme
                # value (values one ULP apart, e.g. [1+2**-52, 1+2**-51]), so
                # every element lands on one side — recursing would re-queue
                # the identical subset forever. Collapse to a leaf exactly
                # like the all-equal case.
                prob[idx] = float(ps[0])
                leaf[idx] = True
                continue
            for is_left, sub_v, sub_p in (
                (True, vals[goes_left], ps[goes_left]),
                (False, vals[~goes_left], ps[~goes_left]),
            ):
                if len(sub_v) == 0:
                    continue
                child = len(key)
                key.append(float(np.mean(sub_v)))
                prob.append(np.nan)
                leaf.append(False)
                left.append(self._NO_CHILD)
                right.append(self._NO_CHILD)
                (left if is_left else right)[idx] = child
                pending.append((child, sub_v, sub_p))
        self._key = np.asarray(key)
        self._prob = np.asarray(prob)
        self._leaf = np.asarray(leaf)
        self._left = np.asarray(left)
        self._right = np.asarray(right)

    def __getitem__(self, x):
        idx = 0
        while not self._leaf[idx]:
            nxt = self._left[idx] if self.match_fun(x, self._key[idx]) else self._right[idx]
            if nxt == self._NO_CHILD:
                raise KeyError(f"BSTProb lookup fell off the tree at {x!r}")
            idx = int(nxt)
        return float(self._prob[idx])


class CDFObject:
    """Histogram empirical CDF. Parity with cdf_object.py:81-107 semantics;
    O(n log n) build and vectorized searchsorted lookups."""

    def __init__(self, x: ArrayLike, bins="auto"):
        self.bins = bins
        self.reset(x, bins)

    def reset(self, x, bins=None):
        self.x = np.asarray(x)
        if bins:
            self.bins = bins
        self.hist, self.bin_edges = np.histogram(self.x, bins=self.bins, density=True)
        s = np.sum(self.hist)
        self.hist = self.hist / (s if s > 0 else 1.0)
        self.bin_mid = (self.bin_edges[1:] + self.bin_edges[:-1]) / 2.0
        self.bin_width = np.mean(self.bin_edges[1:] - self.bin_edges[:-1])
        self.meu = float(np.dot(self.hist, self.bin_mid))
        # cumulative mass up to each right bin edge (== reference's masked sum)
        self.cdf = np.cumsum(self.hist)

    def get_prob_by_value(self, x):
        """P(X <= x) from the histogram CDF (scalar or array).

        Queries below the distribution floor return 0 — not the first bin's
        mass (a far-below-distribution anomaly score must not be credited
        with substantial probability in the CL threshold mechanism)."""
        idx = np.clip(np.searchsorted(self.bin_edges[1:], x, side="left"), 0, len(self.cdf) - 1)
        out = np.where(np.asarray(x) < self.bin_edges[0], 0.0, self.cdf[idx])
        return float(out) if np.isscalar(x) else out

    def get_value_by_prob(self, p):
        """Smallest right-bin-edge whose CDF reaches p (scalar or array)."""
        idx = np.clip(np.searchsorted(self.cdf, p, side="left"), 0, len(self.cdf) - 1)
        out = self.bin_edges[1:][idx]
        return float(out) if np.isscalar(p) else out


def benchmark_reset(n_runs: int = 1000, alpha: float = 2.0, beta: float = 4.0, n: int = 10000):
    """Parity with the reference's CLI timing loop (cdf_object.py:148-155)."""
    import time

    cdf = CDFObject(np.random.gamma(shape=alpha, scale=1.0 / beta, size=(n,)))
    t0 = time.perf_counter()
    for _ in range(n_runs):
        cdf.reset(np.random.gamma(shape=alpha, scale=1.0 / beta, size=(n,)))
    dt = time.perf_counter() - t0
    print(f"Time Delta for {n_runs} runs: {dt} s, {dt / n_runs} s/frame")
    return dt


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--alpha", "-a", type=float, default=2.0)
    parser.add_argument("--beta", "-b", type=float, default=4.0)
    parser.add_argument("--num-samples", "-n", type=int, default=10000)
    args = parser.parse_args()

    x = np.random.gamma(shape=args.alpha, scale=1.0 / args.beta, size=(args.num_samples,))
    cdf = CDFObject(x)
    print("Get Probability from Value")
    for a in np.linspace(0.0, 3.0, 30):
        print(f" - {a:0.03f}: {cdf.get_prob_by_value(a):0.03f}")
    print("Get Value from Probability")
    for p in np.linspace(0.0, 1.0, 10):
        print(f" - {p:0.03f}: {cdf.get_value_by_prob(p):0.03f}")
    print(f"95%: {cdf.get_value_by_prob(0.95)}")
    benchmark_reset(n=args.num_samples, alpha=args.alpha, beta=args.beta)


def normal_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — public-domain algorithm). Used by the robust
    tail-extrapolated threshold; avoids a scipy dependency."""
    assert 0.0 < p < 1.0
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = np.sqrt(-2 * np.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = np.sqrt(-2 * np.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def threshold_from_cdf(cdf: "CDFObject", quantile: float, robust: bool = True) -> float:
    """Anomaly threshold at ``quantile`` from a score CDF.

    ``robust=True`` (the CL default) extrapolates the target quantile from
    the distribution BULK — q50 and q90, which a few true-anomaly scores in
    the history cannot move — scaled by the standard-normal quantile ratio:

        thr = q50 + (z(quantile) / z(0.9)) * (q90 - q50)

    The raw empirical quantile (robust=False) reads the top (1-q) fraction
    of the history directly; with ~1000 samples and q=0.995 that IS the
    handful of anomaly scores the stream just flagged, so each detection
    raises the threshold above the next anomaly (threshold masking, measured
    in benchmarks/cl_quality.py). The extrapolated form tracks the normal
    distribution's scale instead.
    """
    if not robust:
        return float(cdf.get_value_by_prob(quantile))
    # quantile >= 1 was valid pre-robust (the raw empirical quantile clamps
    # to the top bin edge) — clamp instead of letting normal_ppf assert and
    # kill the stream loop; 1-1e-9 ~ z=6, far past any score history
    quantile = min(max(float(quantile), 1e-9), 1.0 - 1e-9)
    q50 = float(cdf.get_value_by_prob(0.5))
    q90 = float(cdf.get_value_by_prob(0.9))
    factor = normal_ppf(quantile) / normal_ppf(0.9)
    return q50 + factor * max(q90 - q50, 0.0)
