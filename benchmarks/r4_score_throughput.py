#!/usr/bin/env python3
"""Bulk anomaly-scoring throughput (offline pipeline pass, flagship model).

Measures the do_anomaly_detection batch_err pass (eval forward + per-frame
eps reduction, anomaly/offline.py:_score_fns) at production batch on the
real chip: float bf16 vs the --quantize int8-dense path. This is the
"score an archive" number that complements bench.py's train+score headline.

Appends JSON lines to benchmarks/r4_quant_results.jsonl.
Run from the repo root, foreground, TPU idle:
  timeout 3000 python benchmarks/r4_score_throughput.py
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


def main():
    import jax
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops import quant
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    from bench import _flagship_config

    print("devices:", jax.devices(), flush=True)
    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    qparams = quant.quantize_params(core, params)

    B = int(os.environ.get("SCORE_BATCH", "768"))
    # uint8 frames normalized on device (ingest semantics, as bench.py)
    x_u8 = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (B, 224, 300, 3), np.uint8)
    )

    def make(forward):
        def batch_err(p, xu8):
            x = xu8.astype(jnp.float32) / 255.0
            x_rec = forward(p, x)
            err = jnp.sum((x - x_rec) ** 2, axis=3)
            eps = jnp.sum(err, axis=(1, 2))
            return eps, jnp.min(err), jnp.max(err)

        return jax.jit(batch_err)

    f_float = make(lambda p, x: core.call(p, x, training=False))
    f_q = make(lambda p, x: quant.call_quantized(core, p, x))

    for name, fn, ps in (("float", f_float, params), ("w8a8", f_q, qparams)):
        for _ in range(3):
            eps, mn, mx = fn(ps, x_u8)
        device_fence(eps)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            eps, mn, mx = fn(ps, x_u8)
        device_fence(eps)
        dt = (time.perf_counter() - t0) / iters
        log({"probe": "score_throughput", "mode": name, "batch": B,
             "ms_per_batch": dt * 1e3, "frames_per_s": B / dt})


if __name__ == "__main__":
    main()
