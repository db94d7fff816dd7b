#!/usr/bin/env python3
"""Experimental Pallas int8 GEMM for the serving-batch dense.

Motivation (r4 probe, r4_quant_results.jsonl): at serving batch (M=16) the
flagship's 268800x4000 int8 dense runs 2.37 ms through XLA's lowering vs a
1.31 ms bandwidth floor (1.08 GB kernel / 819 GB/s) — ~55% attainment, the
same ratio as the bf16 path. At M=16 the MXU itself allows ~49 TOPS
(16/128 rows live), so the op sits right at the BW/compute crossover; a
K-sequential accumulating Pallas kernel targets the floor.

Measures: pallas vs lax.dot_general on the padded serving shape, correctness
vs the XLA dot. Appends to r4_quant_results.jsonl. Run foreground, TPU idle.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r4_quant_results.jsonl")


def log(obj):
    obj = {"ts": time.time(), **obj}
    print(json.dumps(obj), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def make_pallas_gemm(M, K, N, bk, bn):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            x_ref[...], w_ref[...], preferred_element_type=jnp.int32
        )

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.int32)],
    )


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    # padded serving shape: M 16->32 (int8 sublane tile), N 4000->4096 (lanes)
    M, K, N = 32, 268800, 4096
    kw, kx = jax.random.split(jax.random.PRNGKey(0))
    w_i8 = jnp.asarray(jax.random.randint(kw, (K, N), -127, 128, jnp.int32), jnp.int8)
    x_i8 = jnp.asarray(jax.random.randint(kx, (M, K), -127, 128, jnp.int32), jnp.int8)

    ref_fn = jax.jit(
        lambda a, k: lax.dot_general(
            a, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )

    def timeit(f, *a, iters=30):
        for _ in range(3):
            out = f(*a)
        device_fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        device_fence(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    t_ref, y_ref = timeit(ref_fn, x_i8, w_i8)
    log({"probe": "int8_gemm_m32", "impl": "xla_dot", "ms": round(t_ref, 3)})

    import ast
    cfgs = ast.literal_eval(os.environ.get("GEMM_CFGS",
        "((768, 512), (1536, 512), (768, 1024), (2100, 512), (4200, 1024))"))
    for bk, bn in cfgs:
        if K % bk or N % bn:
            continue
        try:
            f = jax.jit(make_pallas_gemm(M, K, N, bk, bn))
            t, y = timeit(f, x_i8, w_i8)
            ok = bool(jnp.array_equal(y, y_ref))
            log({"probe": "int8_gemm_m32", "impl": f"pallas_bk{bk}_bn{bn}",
                 "ms": round(t, 3), "bitexact": ok})
        except Exception as e:
            log({"probe": "int8_gemm_m32", "impl": f"pallas_bk{bk}_bn{bn}",
                 "error": str(e)[:200]})


if __name__ == "__main__":
    main()
