#!/usr/bin/env python3
"""Round-4 experiment: int8-quantized serving forward (ops/quant.py).

Measures, on the real chip, the flagship (KurtosisGlobal latent-2000):
  1. raw big-dense probe: bf16 vs w8 vs w8a8 matmul time at serving batch
     (the 268800x4000 kernel is 2.15 GB bf16 -> 1.08 GB int8; at batch<=16
     the op is weight-streaming bound, so the floor halves);
  2. multicam tick device time, K in {1, 4, 8, 16}, quantized vs float
     (same harness as benchmarks/r2_multicam_bench.py: device-resident
     input, device_fence timing);
  3. fidelity on-device: eps relative deviation quantized vs float.

Writes JSON lines to benchmarks/r4_quant_results.jsonl.

Run from the repo root (axon plugin registration quirk), foreground:
  timeout 1800 python benchmarks/r4_quant_serving.py > /tmp/r4q.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r4_quant_results.jsonl")


def log(obj):
    obj = {"ts": time.time(), **obj}
    print(json.dumps(obj), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def fenced_time(fn, *args, iters=20, warmup=3):
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    for _ in range(warmup):
        out = fn(*args)
    device_fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_fence(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax

    print("devices:", jax.devices(), flush=True)

    # ---- 1. raw dense probe at serving batch ------------------------------
    # weights are generated ON DEVICE: a host-side randn of the 1.08B kernel
    # is 8.6 GB of f64 and a multi-minute upload through the tunnel
    rng = np.random.RandomState(0)
    if not os.environ.get("Q_SKIP_PROBE"):
        _dense_probe(rng)

    # ---- 2. full serving forward (flagship), float vs quantized -----------
    _flagship(rng)


def _dense_probe(rng):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.ops import quant

    B, IN, OUTF = 16, 268800, 4000
    kw, kx = jax.random.split(jax.random.PRNGKey(0))
    w_bf = (jax.random.normal(kw, (IN, OUTF), jnp.bfloat16) * 0.01)
    x = jax.random.normal(kx, (B, IN), jnp.float32)
    k_i8, scale = jax.jit(quant.quantize_dense_kernel)(w_bf)

    f_bf = jax.jit(lambda a, k: (a.astype(jnp.bfloat16) @ k).astype(jnp.float32))
    f_w8 = jax.jit(
        lambda a, k, s: quant._dense({"kernel_i8": k, "scale": s, "bias": jnp.zeros((OUTF,))},
                                     a, jnp.bfloat16, "w8")
    )
    f_w8a8 = jax.jit(
        lambda a, k, s: quant._dense({"kernel_i8": k, "scale": s, "bias": jnp.zeros((OUTF,))},
                                     a, jnp.bfloat16, "w8a8")
    )
    t_bf, y_bf = fenced_time(f_bf, x, w_bf)
    t_w8, y_w8 = fenced_time(f_w8, x, k_i8, scale)
    t_a8, y_a8 = fenced_time(f_w8a8, x, k_i8, scale)
    rel8 = float(jnp.linalg.norm(y_w8.astype(jnp.float32) - y_bf) / jnp.linalg.norm(y_bf))
    rela = float(jnp.linalg.norm(y_a8.astype(jnp.float32) - y_bf) / jnp.linalg.norm(y_bf))
    log({"probe": "dense_268800x4000_b16", "bf16_ms": t_bf * 1e3,
         "w8_ms": t_w8 * 1e3, "w8a8_ms": t_a8 * 1e3,
         "rel_err_w8": rel8, "rel_err_w8a8": rela})
    # free the ~5 GB of probe buffers before building the flagship


def _flagship(rng):
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops import quant

    from bench import _flagship_config

    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    qparams = quant.quantize_params(core, params)
    batches = tuple(int(b) for b in os.environ.get("Q_BATCHES", "1,16").split(","))
    modes = os.environ.get("Q_MODES", "float,w8a8,w8").split(",")
    table = {
        "float": (jax.jit(lambda p, a: core.call(p, a, training=False)), params),
        "w8a8": (jax.jit(lambda p, a: quant.call_quantized(core, p, a, "w8a8")), qparams),
        "w8": (jax.jit(lambda p, a: quant.call_quantized(core, p, a, "w8")), qparams),
    }
    for mode_name in modes:
        fwd, ps = table[mode_name]
        for k in batches:
            xb = jnp.asarray(rng.randint(0, 256, (k, 224, 300, 3), np.uint8)
                             .astype(np.float32) / 255.0)
            t, out = fenced_time(fwd, ps, xb, iters=30)
            log({"probe": "flagship_forward", "mode": mode_name, "batch": k,
                 "device_ms": t * 1e3})
            if mode_name != "float" and k == 16:
                ref = core.call(params, xb, training=False)
                eps_r = jnp.sum(jnp.sum((xb - ref) ** 2, 3), (1, 2))
                eps_q = jnp.sum(jnp.sum((xb - out) ** 2, 3), (1, 2))
                dev = float(jnp.max(jnp.abs(eps_q - eps_r) / jnp.abs(eps_r)))
                log({"probe": "fidelity_eps", "mode": mode_name,
                     "max_rel_dev": dev})


if __name__ == "__main__":
    main()
