#!/usr/bin/env python3
"""Batch-in-lanes experiment for the channel-narrow conv gradients (r5).

Target (VERDICT r2 #1): ~60 ms of the 133.5 ms b768 flagship step is
channel-narrow conv work whose 3-32 channels fill 2-25% of the 128 MXU
lanes; the worst single op is the decoder-head backward dX
(fusion.119: dy[768,224,300,3] -> dX[768,224,300,32], 10.75 ms measured vs
a 4.4 ms HBM floor). Round 1 proposed packing BATCH/SPATIAL into the lane
dimension instead of channels; this script measures each piece of that
proposal on the real chip before/instead of committing to a fused kernel:

  phase gemm:   the bare GEMM both ways on pre-materialized im2col patches
                  G1: P[BHW,27] @ Wm[27,32]      (output lanes = 32, padded)
                  G2: WmT[32,27] @ PT[27,BHW]    (output lanes = BHW, full)
                + the [32,BHW] -> [BHW,32] transpose G2's output would need
  phase xla:    the isolated XLA head-dX (autodiff) at b768 for reference
  phase im2col: what materializing patches costs (the part a fused kernel
                would have to hide)

Writes one JSON line per measurement to benchmarks/r5_results.jsonl.
Run foreground from the repo root (single TPU client);
TCVAE_COMPILE_CACHE=benchmarks/.xla_cache recommended.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

B, H, W_, CI, CO = 768, 224, 300, 32, 3  # head conv: 32 -> 3, stride 1 SAME
K = 9 * CO  # dX contraction: ky*kx*co = 27

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r5_results.jsonl")


def bench(fn, *args, iters=8, warmup=None):
    """Time ``iters`` chained applications of fn INSIDE one jit.

    Through the remote tunnel, a host loop of un-awaited dispatches keeps
    every iteration's output alive at once (8 x 3.3 GB = OOM) and a
    per-iteration fence pays the ~30 ms roundtrip; the in-jit fori_loop
    keeps one live buffer (XLA reuses it) and fences once. A scalar from
    the carried output perturbs the input so iterations stay sequential
    (no CSE/elision).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    out_shape = jax.eval_shape(fn, *args)

    @jax.jit
    def run(*a):
        init = jnp.zeros(out_shape.shape, out_shape.dtype)

        def body(_, c):
            eps = jnp.ravel(c)[0].astype(a[0].dtype) * 0
            return fn(a[0] + eps, *a[1:])

        return lax.fori_loop(0, iters, body, init)

    out = run(*args)  # compile + warm
    device_fence(out)
    t0 = time.perf_counter()
    out = run(*args)
    device_fence(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


def log(name, ms, **kw):
    rec = {"name": name, "ms": round(ms, 3), **kw}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--phases", nargs="+",
                        default=["xla", "gemm", "im2col"],
                        choices=["xla", "gemm", "im2col"])
    parser.add_argument("--batch", type=int, default=B)
    args = parser.parse_args()
    b = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)

    def dev_normal(shape, scale=1.0):
        # generate on device: a host standard_normal + bf16 convert of
        # multi-GB arrays costs minutes of single-core time on this VM
        k = jax.random.PRNGKey(int(np.prod([s % 97 for s in shape])))
        return jax.jit(
            lambda kk: (scale * jax.random.normal(kk, shape)).astype(jnp.bfloat16)
        )(k)

    dy = dev_normal((b, H, W_, CO))

    if "xla" in args.phases:
        w = dev_normal((3, 3, CI, CO), 0.05)
        g = dev_normal((b, H, W_, CI))
        def fwd(gg):
            return lax.conv_general_dilated(
                gg, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # isolate dX: vjp inside jit re-traces the transpose conv only
        head_dx_fn = lambda dyy: jax.vjp(fwd, g)[1](dyy)[0]
        ms, dx_ref = bench(head_dx_fn, dy)
        gbs = (dy.nbytes + dx_ref.nbytes) / ms / 1e6
        log("xla_head_dx", ms, batch=b, hbm_gbs=round(gbs, 1),
            note="autodiff transpose-conv, NHWC")

        def fw_w(ww):
            return lax.conv_general_dilated(
                g, ww, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        head_dw_fn = lambda dyy: jax.vjp(fw_w, w)[1](dyy)[0]
        ms, _ = bench(head_dw_fn, dy)
        gbs = (dy.nbytes + g.nbytes) / ms / 1e6
        log("xla_head_dw", ms, batch=b, hbm_gbs=round(gbs, 1))

    if "gemm" in args.phases:
        n_rows = b * H * W_
        wm = dev_normal((K, CI))
        # pre-materialized patches: the GEMM comparison in isolation
        patches = dev_normal((n_rows, K))
        patches_t = dev_normal((K, n_rows))

        def g1(p):
            return lax.dot_general(p, wm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

        ms, out1 = bench(g1, patches)
        log("gemm_standard_Nout32", ms, batch=b,
            note=f"[{n_rows},27]@[27,32]: output lanes 32/128")

        def g2(pt):
            return lax.dot_general(wm.T, pt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

        ms, out2 = bench(g2, patches_t)
        log("gemm_lanes_packed_NoutBHW", ms, batch=b,
            note=f"[32,27]@[27,{n_rows}]: output lanes full")

        def tr(o):
            return o.T.reshape(n_rows, CI)

        ms, _ = bench(tr, out2)
        log("transpose_32xBHW_to_BHWx32", ms, batch=b,
            note="layout cost the lanes-packed form must pay (or fuse away)")

    if "im2col" in args.phases:
        def build_patches(dyy):
            pad = jnp.pad(dyy, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [pad[:, ky:ky + H, kx:kx + W_, :]
                    for ky in range(3) for kx in range(3)]
            return jnp.concatenate(cols, axis=-1).reshape(b * H * W_, K)

        ms, _ = bench(build_patches, dy)
        log("im2col_materialize", ms, batch=b,
            note="9x dy bytes written+read unless fused into the consumer")


if __name__ == "__main__":
    main()
