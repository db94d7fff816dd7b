#!/usr/bin/env python3
"""r11: fused dense-gradient + Adam update (ops/fused_dense_adam.py) microbench.

Target (traces/train_step_b768_vmem96m_roofline.json): the encoder dense
kernel's update chain is the largest single cost in the flagship step —
dW matmul 8.8 ms (materializes 2.15 GB bf16 to HBM) + Adam fusion 20.3 ms
(re-reads it along with param+mu+nu). The decoder dense adds ~5.5 + ~2.5 ms.
Fusing the matmul into the update removes the gradient's HBM round-trip:

  encoder theoretical floor:  (param+mu+nu in+out = 12.9 GB + x 0.41 GB)
                              / 819 GB/s  = 16.3 ms   (vs ~29.1 measured)
  decoder theoretical floor:  (3.23 GB + dz 0.21 GB) / 819 = 4.2 ms (vs ~8)

MXU has 2x slack: dW FLOPs / HBM bytes = 2K/12 = 128 flop/byte < the 240
v5e ridge, so the kernel is HBM-bound and the epilogue rides under the DMA.

Variants per shape:
  xla    jit(dot_general -> adam epilogue), w/mu/nu donated — the in-step
         pattern XLA produces today, isolated.
  fused  jit(fused_dense_grad_adam), donated.

Usage: python benchmarks/r11_fused_dense_adam.py [--shapes enc,dec]
       [--variants xla,fused] [--steps N]
Appends to benchmarks/r11_results.jsonl. Serialize with all other TPU work.
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

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r11_results.jsonl")

SHAPES = {
    # (K=batch, M=in_features, N=out_features) — flagship b768
    "enc": (768, 268800, 4000),
    "dec": (768, 2000, 134400),
}


def make_operands(K, M, N):
    """Device-side init (host uploads through the tunnel are minutes/GB)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 5)
        x = (0.5 * jax.random.normal(ks[0], (K, M))).astype(jnp.bfloat16)
        dz = (1e-3 * jax.random.normal(ks[1], (K, N))).astype(jnp.bfloat16)
        w = (0.02 * jax.random.normal(ks[2], (M, N))).astype(jnp.bfloat16)
        mu = (1e-4 * jax.random.normal(ks[3], (M, N))).astype(jnp.bfloat16)
        nu = (1e-6 * jax.random.uniform(ks[4], (M, N))).astype(jnp.bfloat16)
        return x, dz, w, mu, nu

    return make(jax.random.PRNGKey(0))


def build_step(variant):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops.fused_dense_adam import (
        fused_dense_grad_adam,
        fused_dense_grad_adam_reference,
    )

    fn = fused_dense_grad_adam if variant == "fused" else fused_dense_grad_adam_reference

    def step(x, dz, w, mu, nu, count):
        return fn(x, dz, w, mu, nu, lr=1e-4, b1=0.9, b2=0.999, eps=1e-8,
                  count=count)

    return jax.jit(step, donate_argnums=(2, 3, 4))


def run(shape_name, variant, steps, check):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    K, M, N = SHAPES[shape_name]
    x, dz, w, mu, nu = make_operands(K, M, N)
    step = build_step(variant)

    rec = {"shape": shape_name, "variant": variant, "K": K, "M": M, "N": N}

    if check:
        # Validate the COMPILED kernel (not interpret mode) at a reduced M/N
        # — full scale can't hold ref+got+originals in 16 GB HBM. Tolerance:
        # ~1 bf16 ulp (tiled dot accumulation order differs from the
        # whole-array dot; the elementwise math matches).
        from trustedai_cl_vae_ad_tpu.ops.fused_dense_adam import (
            fused_dense_grad_adam,
            fused_dense_grad_adam_reference,
        )

        # fixed reduced shapes that exercise the same grid layout as the full
        # shape (dz-resident for enc, x-resident for dec)
        cK, cM, cN = (K, 12800, 4000) if shape_name == "enc" else (K, 2000, 13440)
        cx, cdz, cw, cmu, cnu = make_operands(cK, cM, cN)
        kw = dict(lr=1e-4, b1=0.9, b2=0.999, eps=1e-8, count=jnp.int32(5))
        ref = jax.jit(
            lambda *a: fused_dense_grad_adam_reference(*a, **kw)
        )(cx, cdz, cw, cmu, cnu)
        got = jax.jit(
            lambda *a: fused_dense_grad_adam(*a, **kw)
        )(cx, cdz, cw, cmu, cnu)
        errs = {}
        for name, a, b in zip(("w", "mu", "nu"), got, ref):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            # scale-normalized: per-element relative error explodes at
            # cancellation zeros; diffs are ~1 bf16 ulp of the tensor scale
            # (tiled-vs-whole dot accumulation order)
            errs[name] = float(jnp.max(jnp.abs(a32 - b32)) / jnp.max(jnp.abs(b32)))
        rec["max_err_vs_scale"] = errs
        rec["check_shape"] = [cK, cM, cN]
        assert all(v < 1 / 64 for v in errs.values()), errs
        del ref, got, cx, cdz, cw, cmu, cnu

    # compiled-memory sanity: aliasing failures show up as temp copies here
    try:
        compiled = step.lower(x, dz, w, mu, nu, jnp.int32(1)).compile()
        mem = compiled.memory_analysis()
        rec["hbm_temp_gb"] = round(getattr(mem, "temp_size_in_bytes", 0) / 2**30, 3)
        rec["hbm_total_gb"] = round(
            (getattr(mem, "temp_size_in_bytes", 0)
             + getattr(mem, "argument_size_in_bytes", 0)) / 2**30, 3)
    except Exception as e:  # memory_analysis is best-effort on this runtime
        rec["hbm_note"] = str(e)[:120]

    cnt = jnp.int32(1)
    for i in range(3):
        w, mu, nu = step(x, dz, w, mu, nu, cnt + i)
    device_fence(w)
    t0 = time.perf_counter()
    for i in range(steps):
        w, mu, nu = step(x, dz, w, mu, nu, cnt + 3 + i)
    device_fence(w)
    rec["ms"] = round((time.perf_counter() - t0) / steps * 1e3, 3)

    bytes_floor = (6 * M * N * 2 + K * M * 2 + K * N * 2)
    rec["hbm_floor_ms"] = round(bytes_floor / 819e9 * 1e3, 3)
    rec["ts"] = time.time()
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="enc,dec")
    ap.add_argument("--variants", default="xla,fused")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices())
    for shape in args.shapes.split(","):
        for variant in args.variants.split(","):
            run(shape, variant, args.steps, check=not args.no_check)


if __name__ == "__main__":
    main()
