#!/usr/bin/env python3
"""r11 diagnosis: WHY the fused dense-grad+Adam kernel ran 4x off its floor.

ANSWER (BENCH_NOTES.md r11): lane-misaligned N=4000 makes Pallas
input_output_aliases fail (Mosaic inserts full state copies); at N=4096 it
connects (--N 4096 run: fused 1.79 ms, temp 0). The kernel is archived in
r11_kernel.py — dead end, XLA output-fuses the dot in the real step.

The full-scale enc measurement (r11_results.jsonl) came in at 65.1 ms vs
XLA's 40.3 and a 16.3 ms HBM floor, with 6.16 GB of compiled temp (= w/mu/nu
copies, i.e. the jit donation did not connect to the pallas aliasing).
This harness isolates the suspects at the reduced enc shape
(K=768, M=12800, N=4000, bf16; 1/21 of full scale, same dz-resident grid):

  xla        jitted jnp reference, donated (the baseline at this scale)
  fused      the shipped kernel as-is
  fused_xt   same kernel but x is passed pre-transposed (M, K) so the block
             dot is the MXU-native (bm, K) @ (K, bn) — tests the hypothesis
             that the dim-0-contraction forces a per-block relayout of x
  fused_big  fused with 4x larger block budget (bm 256 -> 1024): tests
             grid-step overhead
  dot_only   kernel that only computes the block dot and writes bf16 g —
             isolates dot cost + x/dz streaming
  epi_only   kernel that streams a precomputed g and applies the epilogue —
             isolates the VPU epilogue + w/mu/nu streaming

Each records ms/step and the compiled temp bytes (aliasing check).
Usage: python benchmarks/r11_diag.py [--steps N] [--variants a,b,c]
Appends to benchmarks/r11_results.jsonl (variant names prefixed diag_).
Serialize with all other TPU work.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r11_results.jsonl")

K, M, N = 768, 12800, 4000


def probe():
    """CLAUDE.md landmine: probe the tunnel before long TPU work."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((64, 64)); print(float((x @ x).sum()))")
    r = subprocess.run([sys.executable, "-c", code], timeout=180,
                       capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        raise RuntimeError(f"TPU probe failed: {r.stderr[-500:]}")
    print("probe ok:", r.stdout.strip())


def make_operands(transposed_x=False):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 5)
        x = (0.5 * jax.random.normal(ks[0], (K, M))).astype(jnp.bfloat16)
        if transposed_x:
            x = x.T
        dz = (1e-3 * jax.random.normal(ks[1], (K, N))).astype(jnp.bfloat16)
        w = (0.02 * jax.random.normal(ks[2], (M, N))).astype(jnp.bfloat16)
        mu = (1e-4 * jax.random.normal(ks[3], (M, N))).astype(jnp.bfloat16)
        nu = (1e-6 * jax.random.uniform(ks[4], (M, N))).astype(jnp.bfloat16)
        return x, dz, w, mu, nu

    return make(jax.random.PRNGKey(0))


def build(variant, block_bytes=None):
    """Return (step_fn, operands, donate, floor_ms)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import r11_kernel as fda

    kw = dict(lr=1e-4, b1=0.9, b2=0.999, eps=1e-8)
    itm = 2
    full_floor = (6 * M * N + K * M + K * N) * itm / 819e9 * 1e3

    if variant == "xla":
        ops = make_operands()
        fn = lambda x, dz, w, mu, nu, c: fda.fused_dense_grad_adam_reference(
            x, dz, w, mu, nu, count=c, **kw)
        return jax.jit(fn, donate_argnums=(2, 3, 4)), ops, full_floor

    if variant in ("fused", "fused_big"):
        if variant == "fused_big":
            # larger blocks via the module knob; restored by caller
            fda._BLOCK_BYTES = 8 * 1024 * 1024
        ops = make_operands()
        fn = lambda x, dz, w, mu, nu, c: fda.fused_dense_grad_adam(
            x, dz, w, mu, nu, count=c, **kw)
        return jax.jit(fn, donate_argnums=(2, 3, 4)), ops, full_floor

    # hand-built variants share the dz-resident layout of the shipped kernel
    bn = N
    bb = block_bytes or 2 * 1024 * 1024
    bm = fda._pick_block(M, 128, max(128, bb // (bn * itm)))
    grid = (M // bm,)
    state_spec = pl.BlockSpec((bm, bn), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dz_spec = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((6, 1), (lambda i: (0, 0)), memory_space=pltpu.SMEM)

    def scalars(c):
        cnt = jnp.asarray(c, jnp.float32)
        return jnp.stack([
            jnp.float32(kw["lr"]), jnp.float32(kw["b1"]), jnp.float32(kw["b2"]),
            jnp.float32(kw["eps"]),
            1.0 - jnp.float32(kw["b1"]) ** cnt,
            1.0 - jnp.float32(kw["b2"]) ** cnt,
        ]).reshape(6, 1)

    if variant == "fused_xt":
        x_spec = pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def kernel(s_ref, x_ref, dz_ref, w_ref, mu_ref, nu_ref,
                   w_out, mu_out, nu_out):
            lr, b1, b2, eps, bc1, bc2 = (s_ref[i, 0] for i in range(6))
            g32 = jax.lax.dot_general(
                x_ref[:], dz_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            w_n, mu_n, nu_n = fda.adam_epilogue(
                g32, w_ref[:], mu_ref[:], nu_ref[:], lr, b1, b2, eps, bc1, bc2)
            w_out[:] = w_n
            mu_out[:] = mu_n
            nu_out[:] = nu_n

        call = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[smem_spec, x_spec, dz_spec, state_spec, state_spec,
                      state_spec],
            out_specs=[state_spec, state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((M, N), jnp.bfloat16)] * 3,
            input_output_aliases={3: 0, 4: 1, 5: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        ops = make_operands(transposed_x=True)
        fn = lambda xt, dz, w, mu, nu, c: call(scalars(c), xt, dz, w, mu, nu)
        return jax.jit(fn, donate_argnums=(2, 3, 4)), ops, full_floor

    if variant == "dot_only":
        x_spec = pl.BlockSpec((K, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((bm, bn), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def kernel(x_ref, dz_ref, g_out):
            g_out[:] = jax.lax.dot_general(
                x_ref[:], dz_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        call = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, dz_spec], out_specs=g_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        x, dz, w, mu, nu = make_operands()
        floor = (M * N + K * M + K * N) * itm / 819e9 * 1e3
        fn = lambda x, dz, c: call(x, dz)
        return jax.jit(fn), (x, dz), floor

    if variant == "copy_only":
        # Mosaic streaming ceiling control: just copy w/mu/nu through VMEM.
        def kernel(w_ref, mu_ref, nu_ref, w_out, mu_out, nu_out):
            w_out[:] = w_ref[:]
            mu_out[:] = mu_ref[:]
            nu_out[:] = nu_ref[:]

        call = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[state_spec, state_spec, state_spec],
            out_specs=[state_spec, state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((M, N), jnp.bfloat16)] * 3,
            input_output_aliases={0: 0, 1: 1, 2: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        x, dz, w, mu, nu = make_operands()
        floor = (6 * M * N) * itm / 819e9 * 1e3
        fn = lambda w, mu, nu, c: call(w, mu, nu)
        return jax.jit(fn, donate_argnums=(0, 1, 2)), (w, mu, nu), floor

    if variant == "epi_bf16":
        # Conversion-cost control: the same streaming epilogue with ALL
        # arithmetic in bf16 (numerically wrong, perf-isolation only).
        g_spec = pl.BlockSpec((bm, bn), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def kernel(s_ref, g_ref, w_ref, mu_ref, nu_ref, w_out, mu_out, nu_out):
            lr, b1, b2, eps, bc1, bc2 = (
                s_ref[i, 0].astype(jnp.bfloat16) for i in range(6))
            g = g_ref[:]
            mu_n = b1 * mu_ref[:] + (1 - b1) * g
            nu_n = b2 * nu_ref[:] + (1 - b2) * (g * g)
            upd = lr * (mu_n / bc1) / (jnp.sqrt(nu_n / bc2) + eps)
            w_out[:] = w_ref[:] - upd
            mu_out[:] = mu_n
            nu_out[:] = nu_n

        call = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[smem_spec, g_spec, state_spec, state_spec, state_spec],
            out_specs=[state_spec, state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((M, N), jnp.bfloat16)] * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        import jax.random as jr
        x, dz, w, mu, nu = make_operands()
        g = jax.jit(lambda k: (1e-3 * jr.normal(k, (M, N))).astype(jnp.bfloat16)
                    )(jr.PRNGKey(1))
        floor = (7 * M * N) * itm / 819e9 * 1e3
        fn = lambda g, w, mu, nu, c: call(scalars(c), g, w, mu, nu)
        return jax.jit(fn, donate_argnums=(1, 2, 3)), (g, w, mu, nu), floor

    if variant == "epi_only":
        g_spec = pl.BlockSpec((bm, bn), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def kernel(s_ref, g_ref, w_ref, mu_ref, nu_ref, w_out, mu_out, nu_out):
            lr, b1, b2, eps, bc1, bc2 = (s_ref[i, 0] for i in range(6))
            w_n, mu_n, nu_n = fda.adam_epilogue(
                g_ref[:].astype(jnp.float32), w_ref[:], mu_ref[:], nu_ref[:],
                lr, b1, b2, eps, bc1, bc2)
            w_out[:] = w_n
            mu_out[:] = mu_n
            nu_out[:] = nu_n

        call = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[smem_spec, g_spec, state_spec, state_spec, state_spec],
            out_specs=[state_spec, state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((M, N), jnp.bfloat16)] * 3,
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        import jax.random as jr
        x, dz, w, mu, nu = make_operands()
        g = jax.jit(lambda k: (1e-3 * jr.normal(k, (M, N))).astype(jnp.bfloat16)
                    )(jr.PRNGKey(1))
        floor = (7 * M * N) * itm / 819e9 * 1e3
        fn = lambda g, w, mu, nu, c: call(scalars(c), g, w, mu, nu)
        return jax.jit(fn, donate_argnums=(1, 2, 3)), (g, w, mu, nu), floor

    raise ValueError(variant)


def run(variant, steps):
    import jax
    import jax.numpy as jnp

    import r11_kernel as fda
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    old_bb = fda._BLOCK_BYTES
    try:
        step, ops, floor = build(variant)
        rec = {"variant": f"diag_{variant}", "K": K, "M": M, "N": N}

        cnt = jnp.int32(1)
        try:
            compiled = step.lower(*ops, cnt).compile()
            mem = compiled.memory_analysis()
            rec["hbm_temp_gb"] = round(
                getattr(mem, "temp_size_in_bytes", 0) / 2**30, 4)
        except Exception as e:
            rec["hbm_note"] = str(e)[:120]

        n_state = {"xla": 3, "fused": 3, "fused_big": 3, "fused_xt": 3,
                   "dot_only": 0, "epi_only": 3, "copy_only": 3,
                   "epi_bf16": 3}[variant]
        state = ops[-n_state:] if n_state else ()
        fixed = ops[:len(ops) - n_state]
        for i in range(3):
            out = step(*fixed, *state, cnt + i)
            if n_state:
                state = out
        device_fence(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for i in range(steps):
            out = step(*fixed, *state, cnt + 3 + i)
            if n_state:
                state = out
        device_fence(out[0] if isinstance(out, tuple) else out)
        rec["ms"] = round((time.perf_counter() - t0) / steps * 1e3, 3)
        rec["floor_ms"] = round(floor, 3)
        rec["ts"] = time.time()
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    finally:
        fda._BLOCK_BYTES = old_bb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument(
        "--variants", default="xla,fused,fused_xt,fused_big,dot_only,epi_only")
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--N", type=int, default=None,
                    help="override N (e.g. 4096 to test 128-multiple lanes)")
    args = ap.parse_args()

    if args.N:
        global N
        N = args.N

    if not args.no_probe:
        probe()

    import jax
    print("devices:", jax.devices(), flush=True)
    for v in args.variants.split(","):
        run(v, args.steps)


if __name__ == "__main__":
    main()
