#!/usr/bin/env python3
"""r14: encoder-input space-to-depth — the last unprobed lane-padding lever.

Encoder conv1 reads RGB at 3/128 MXU input lanes
(/root/reference/src/abstract_cvae.py:22-29); its dW backward is one of the
"channel-narrow conv grads at lane-padding ceilings" the roofline residual
names (traces/train_step_b768_vmem96m). models/cvae.py proved bit-exact conv
repacking on the decoder side (_rgb_head_s2d, _upconv2x_subpixel — both
measured dead ends); this probe measures the ENCODER-side equivalent
(_conv1_s2d: 2x2 pixels -> channels, 3->12 lanes, stride-2 3x3 -> stride-1
2x2) on the FULL flagship step — microbenches mislead here (r11 lesson:
standalone jits materialize temps the real step fuses away).

Usage: python benchmarks/r14_encoder_s2d.py [--batch 768] [--steps 20]
Appends to benchmarks/r14_results.jsonl. Serialize with all other TPU work.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r14_results.jsonl")


def run(s2d: bool, batch: int, steps: int, warmup: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    cfg = bench._flagship_config()
    cfg["model"]["s2d_input"] = bool(s2d)
    core = KurtosisGlobalCVAE(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
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
    float(loss)  # fence (block_until_ready lies on this runtime)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, z = step_fn(
            params, opt_state, x, rngs[warmup + i], mu, sigma)
    lossf = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(lossf)
    return {
        "s2d_input": bool(s2d),
        "batch": batch,
        "steps": steps,
        "ms_per_step": round(1e3 * dt / steps, 1),
        "fps": round(batch * steps / dt, 1),
        "loss": lossf,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    for s2d in (False, True):
        rec = run(s2d, args.batch, args.steps)
        rec["ts"] = time.time()
        print(json.dumps(rec))
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
