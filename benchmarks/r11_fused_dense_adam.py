#!/usr/bin/env python3
"""r11: fused dense-gradient + Adam update microbench — DEAD END (see verdict).

The premise (from a misread of the b768 trace): the encoder dense update was
thought to be "8.8 ms dW matmul + 20.3 ms Adam fusion" with a 2.15 GB bf16 dW
round-tripping HBM, so a Pallas kernel (archived in r11_kernel.py) computed
dW tile-wise on the MXU and applied Adam in-VMEM.

VERDICT (BENCH_NOTES.md r11): dead end, kernel deleted from the package.
(1) At the real lane-misaligned N=4000, Pallas input_output_aliases fails —
Mosaic inserts full w/mu/nu copies (6.16 GB temp) and the kernel runs 65 ms
vs XLA's 40. (2) At aligned N=4096 aliasing connects and the kernel hits
22.4 ms (1.35x floor) vs standalone XLA 41.4 — but the REAL STEP's XLA
already output-fuses the dW dot into the Adam chain (add_convert_fusion,
20.3 ms, no dW materialization; the "8.8 ms dW matmul" op was actually the
forward dense recompute). Best-case Pallas loses to what XLA already emits.

Variants per shape:
  xla        jit(dot_general -> adam epilogue), w/mu/nu donated.
  fused      jit(fused_dense_grad_adam), donated.
  xla_opt /  same, compiled under TCVAE_COMPILER_OPTIONS (vmem96m) like the
  fused_opt  real train-step site.

Usage: python benchmarks/r11_fused_dense_adam.py [--shapes enc,dec,enc4096]
       [--variants xla,fused,xla_opt,fused_opt] [--steps N]
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
    # the encoder shape with a 128-multiple lane dim (latent 2048): the
    # aliasing-connects case — sizes the prize IF the latent head were
    # padded/aligned (diag showed N=4000 forces full state copies)
    "enc4096": (768, 268800, 4096),
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

    from r11_kernel import (
        fused_dense_grad_adam,
        fused_dense_grad_adam_reference,
    )
    from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit

    fn = (fused_dense_grad_adam if variant.startswith("fused")
          else fused_dense_grad_adam_reference)

    def step(x, dz, w, mu, nu, count):
        return fn(x, dz, w, mu, nu, lr=1e-4, b1=0.9, b2=0.999, eps=1e-8,
                  count=count)

    # "*_opt" variants compile under TCVAE_COMPILER_OPTIONS (the bench.py
    # default vmem96m) like the real train-step site — the option changes
    # XLA's fusion decisions (it output-fuses the dW dot into the Adam chain
    # in the full step).
    if variant.endswith("_opt"):
        os.environ.setdefault(
            "TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")
        return optioned_jit(step, donate_argnums=(2, 3, 4))
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
        from r11_kernel import (
            fused_dense_grad_adam,
            fused_dense_grad_adam_reference,
        )

        # fixed reduced shapes that exercise the same grid layout as the full
        # shape (dz-resident for enc, x-resident for dec)
        cK, cM, cN = {"enc": (K, 12800, 4000),
                      "enc4096": (K, 12800, 4096),
                      "dec": (K, 2000, 13440)}[shape_name]
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
