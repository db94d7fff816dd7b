#!/usr/bin/env python3
"""r12: does a 128-multiple latent size run faster than the flagship's 2000?

Motivation (r11): the latent-2000 flagship's encoder head is 2*latent = 4000
wide — not a multiple of the 128 MXU/VREG lanes. r11 showed lane-misaligned
state shapes hurt Pallas aliasing badly; XLA handles the misalignment
natively, but every [.., 4000] tile still pads 4000 -> 4096 lanes (2.4%
dead lanes) in the dense forward/backward/update chains. This harness runs
bench.py's EXACT step at latent 2048 (head 4096, fully lane-aligned, +2.4%
params: 1.376B vs 1.344B) and at 2000, same batch, same process.

Outcome feeds a sizing guideline in BENCH_NOTES: if 2048 matches or beats
2000 while doing 2.4% more work, users free to choose their latent size
should pick 128-multiples (the reference's config.yml:latent 2000 is kept
for the headline bench — parity pins it).

Usage: python benchmarks/r12_latent_alignment.py [--batch 768] [--steps 20]
Appends to benchmarks/r12_results.jsonl. Serialize with all other TPU work.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)
os.environ.setdefault("TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r12_results.jsonl")


def run(latent: int, batch: int, steps: int, warmup: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    core = KurtosisGlobalCVAE(
        bench._flagship_config(latent=latent), dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = bench.build_bench_step(core, optimizer)

    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 224, 300, 3), np.uint8))
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    for i in range(warmup):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)  # device fence (block_until_ready doesn't sync here)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(
            params, opt_state, x, rngs[warmup + i], mu, sigma)
    float(loss)
    dt = time.perf_counter() - t0
    rec = {"latent": latent, "head": 2 * latent, "batch": batch,
           "params": n_params,
           "frames_per_s": round(batch * steps / dt, 1),
           "ms_per_step": round(dt / steps * 1e3, 2), "ts": time.time()}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    # free the ~13 GB before the next latent size compiles
    del params, opt_state, step_fn, core
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--latents", default="2000,2048")
    args = ap.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)
    for latent in (int(s) for s in args.latents.split(",")):
        run(latent, args.batch, args.steps)


if __name__ == "__main__":
    main()
