#!/usr/bin/env python3
"""r13: flagship-scale train+score throughput for ALL THREE model families.

BENCH_NOTES' perf story is the KurtosisGlobal flagship; users picking
KurtosisSingle (per-dim moments) or KLGaussian (analytic-ELBO) at the same
architecture should know what the loss family costs. Expectation: ~nothing —
the step is conv/dense-bound, and all three losses are O(B·latent)
reductions XLA fuses into the forward — but expectations get measured here
(the reference's diagnostics were also "free" only after checking, r1).

Runs bench.py's exact step (b768, adam_lean, vmem96m option) with only
``model.type`` (and the family's loss keys) changed.

Usage: python benchmarks/r13_model_families.py [--batch 768] [--steps 20]
Appends to benchmarks/r13_results.jsonl. Serialize with all other TPU work.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r13_results.jsonl")


def run(model_type: str, batch: int, steps: int, warmup: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from trustedai_cl_vae_ad_tpu.registry import import_vae_based_on_type
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    cfg = bench._flagship_config()
    cfg["model"]["type"] = model_type
    if model_type == "KLGaussian":
        # the flagship config carries the KURTOSIS family's weights, where
        # w_kl_divergence is 0.0 — that would benchmark an MSE-only
        # autoencoder (the KL term's gradient folds to zero). Weight the
        # family's actual objective so the measured graph is a user's graph.
        cfg["loss"]["w_kl_divergence"] = 1e-3
    core = import_vae_based_on_type(model_type)(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = bench.build_bench_step(core, optimizer)

    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 224, 300, 3), np.uint8))
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    for i in range(warmup):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    assert np.isfinite(float(loss)), (model_type, float(loss))  # + device fence
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(
            params, opt_state, x, rngs[warmup + i], mu, sigma)
    float(loss)
    dt = time.perf_counter() - t0
    rec = {"model_type": model_type, "batch": batch,
           "frames_per_s": round(batch * steps / dt, 1),
           "ms_per_step": round(dt / steps * 1e3, 2),
           "compiler_options": os.environ.get("TCVAE_COMPILER_OPTIONS", ""),
           "ts": time.time()}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    del params, opt_state, step_fn, core  # free HBM before the next family
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--types", default="KurtosisGlobal,KurtosisSingle,KLGaussian")
    args = ap.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)
    for t in (s.strip() for s in args.types.split(",") if s.strip()):
        run(t, args.batch, args.steps)


if __name__ == "__main__":
    main()
