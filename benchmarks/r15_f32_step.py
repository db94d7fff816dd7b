#!/usr/bin/env python3
"""r15 diag: why did the ingest e2e's f32-input step run 180 ms at b384
when bench.py's u8-input step runs 74 ms?

Isolates the two differences between the paths:
  A  u8-input step, one reused batch      (bench.py control)
  B  f32-input step, one reused batch     (graph difference only)
  C  f32-input step, 4 cycling batches    (adds the device-cache access pattern)

Usage: python benchmarks/r15_f32_step.py [--batch 384] [--steps 18]
Appends to benchmarks/r15_results.jsonl. Serialize with other TPU work.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r15_results.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--steps", type=int, default=18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from benchmarks.ingest_e2e import build_f32_step
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    core = KurtosisGlobalCVAE(bench._flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    optimizer = adam_lean(1e-4)
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), 64)
    rs = np.random.RandomState(0)
    x_u8_host = rs.randint(0, 256, (args.batch, 224, 300, 3), np.uint8)

    def measure(step_fn, xs, label):
        params = core.init(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        for i in range(5):  # warmup
            params, opt_state, loss, z = step_fn(
                params, opt_state, xs[i % len(xs)], rngs[i], mu, sigma)
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt_state, loss, z = step_fn(
                params, opt_state, xs[i % len(xs)], rngs[5 + i], mu, sigma)
        lossf = float(loss)
        dt = time.perf_counter() - t0
        assert np.isfinite(lossf)
        rec = {"variant": label, "batch": args.batch, "steps": args.steps,
               "ms_per_step": round(1e3 * dt / args.steps, 1),
               "fps": round(args.batch * args.steps / dt, 1), "ts": time.time()}
        print(json.dumps(rec))
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        del params, opt_state
        return rec

    u8_step = bench.build_bench_step(core, optimizer)
    f32_step = build_f32_step(core, optimizer)

    x_u8 = jax.device_put(x_u8_host)
    measure(u8_step, [x_u8], "A_u8_single")

    @jax.jit
    def to_f32(x):
        return x.astype(jnp.float32) / 255.0

    x_f32 = to_f32(x_u8)
    float(jnp.float32(x_f32[0, 0, 0, 0]))
    measure(f32_step, [x_f32], "B_f32_single")

    xs = [to_f32(jax.device_put(
        rs.randint(0, 256, (args.batch, 224, 300, 3), np.uint8))) for _ in range(4)]
    float(jnp.float32(xs[-1][0, 0, 0, 0]))
    del x_u8
    measure(f32_step, xs, "C_f32_cycling4")


if __name__ == "__main__":
    main()
