#!/usr/bin/env python3
"""r9: 8-bit (float8_e4m3) Adam moment storage — update-only microbench.

The b768 flagship step spends ~33 ms in the Adam update fusions at 73-86% of
the HBM roofline (traces/train_step_b768_roofline.json): the update is pure
bandwidth. Moment storage is already bf16 (ops/adam.py adam_lean); dropping
the two 1.34B-element moment trees to 1 byte/elem saves ~5.4 GB of the
~18.8 GB update traffic (~6.6 ms at 819 GB/s) AND frees 2.69 GB of HBM,
which may unlock batch 896+ (the b896 blocker is memory, BENCH_NOTES r3).

Numerics knobs measured here:
- e4m3 round-to-nearest: ~6% relative resolution — the b2=0.999 EMA's ~1e-3
  per-step increments round away (the same freeze adam_lean fixed for bf16,
  30x worse), so RTN is expected to need...
- stochastic rounding: unbiased EMA. Threefry SR measured +30 ms for one
  1.34B tree (BENCH_NOTES r2); here a fused counter-based xorshift hash
  generates the dither bits in-register (~10 VPU ops/elem, no HBM traffic,
  no RNG state) — expected ~free while the chain is bandwidth-bound.

Variants timed (update only, flagship-shaped tree):
  lean        adam_lean control (bf16 moments, RTN)          [~29.5 ms known]
  lean_srt    adam_lean + threefry SR nu                     [~60 ms known]
  lean_srx    bf16 moments + xorshift SR on nu
  fp8         e4m3 moments (per-row scales on big leaves), RTN
  fp8_srx     e4m3 moments + xorshift SR on both moments

Usage: python benchmarks/r9_adam8.py [--variants a,b,...] [--steps N]
Appends to benchmarks/r9_results.jsonl.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r9_results.jsonl")


def flagship_tree():
    """The flagship param tree's leaf shapes (1.344B params, bf16), created
    ON DEVICE (an 8 GB host upload through the tunnel costs 10+ minutes on a
    slow day; a jitted PRNG init costs seconds)."""
    import jax
    import jax.numpy as jnp

    shapes = {
        "enc_conv1": (3, 3, 3, 32),
        "enc_conv2": (3, 3, 32, 64),
        "enc_dense": (268800, 4000),   # 1.075B
        "dec_dense": (2000, 134400),   # 0.269B
        "dec_convt1": (3, 3, 64, 64),
        "dec_convt2": (3, 3, 64, 32),
        "dec_head": (3, 3, 32, 3),
    }

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 2 * len(shapes))
        params = {
            k: (0.02 * jax.random.normal(ks[i], s)).astype(jnp.bfloat16)
            for i, (k, s) in enumerate(shapes.items())
        }
        grads = {
            k: (1e-3 * jax.random.normal(ks[len(shapes) + i], s)).astype(jnp.bfloat16)
            for i, (k, s) in enumerate(shapes.items())
        }
        return params, grads

    return make(jax.random.PRNGKey(0))


def time_update(optimizer, params, grads, steps=20, warmup=3):
    import jax

    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    # fresh device-side copy: apply() donates params, and the caller reuses
    # the same tree across variants (variant 2 would see deleted buffers)
    params = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))(params)
    state = optimizer.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def apply(params, state, grads):
        import optax

        updates, state = optimizer.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(warmup):
        params, state = apply(params, state, grads)
    device_fence(params)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, state = apply(params, state, grads)
    device_fence(params)
    return (time.perf_counter() - t0) / steps * 1e3


def build_variant(name):
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean
    from trustedai_cl_vae_ad_tpu.ops.adam8 import adam_fp8

    if name == "lean":
        return adam_lean(1e-4)
    if name == "lean_srt":
        return adam_lean(1e-4, stochastic_round_nu=True)
    if name == "lean_srx":
        return adam_fp8(1e-4, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
                        stochastic_round="nu")
    if name == "fp8":
        return adam_fp8(1e-4, stochastic_round="none")
    if name == "fp8_srx":
        return adam_fp8(1e-4, stochastic_round="both")
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="lean,lean_srx,fp8,fp8_srx")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    params, grads = flagship_tree()
    for name in args.variants.split(","):
        try:
            ms = time_update(build_variant(name), params, grads, steps=args.steps)
            rec = {"experiment": "r9_adam8_update_only", "variant": name,
                   "ms_per_update": round(ms, 2)}
        except Exception as e:
            rec = {"experiment": "r9_adam8_update_only", "variant": name,
                   "error": str(e)[-300:]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
