#!/usr/bin/env python3
"""Multicam capacity with the int8 serving forward: device ms/tick vs float.

Same methodology as the r2 multicam numbers in BENCH_NOTES (device-resident
uint8 1080p frames, fenced timing of the engine's one-dispatch-per-tick jit;
the tunnel's ~40 MB/s frame upload is environment, not engine). K sweeps past
16 to find the 30 fps (33 ms tick) capacity directly instead of projecting.

Appends to benchmarks/r4_quant_results.jsonl.
Run from the repo root, foreground, TPU idle:
  timeout 3000 python benchmarks/r4_multicam_int8.py
"""

import gc
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

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    config = _flagship_config()
    core = KurtosisGlobalCVAE(config, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = VAEModel(core)
    rng = np.random.RandomState(0)

    ks = [int(k) for k in os.environ.get("MC_KS", "16,24,32").split(",")]
    modes = os.environ.get("MC_MODES", "float,w8a8").split(",")
    for mode in modes:
        for k in ks:
            engine = MultiCameraEngine(model, config, n_streams=k,
                                       quantize=(mode == "w8a8"))
            # device-resident frames: measure the engine's device work, not
            # the tunnel upload
            frames_dev = jnp.asarray(
                rng.randint(0, 256, (k, 1080, 1920, 3), np.uint8)
            )
            valid = jnp.ones((k,), bool)
            alpha = jnp.float32(engine.stream_error_ma)
            maps, scalars = engine.maps, engine.scalars
            for _ in range(3):
                maps, scalars, norm_u8, rec_u8, sc = engine._step_j(
                    engine._serve_params, frames_dev, maps, scalars, alpha, valid
                )
            device_fence(sc)
            ticks = 15
            t0 = time.perf_counter()
            for _ in range(ticks):
                maps, scalars, norm_u8, rec_u8, sc = engine._step_j(
                    engine._serve_params, frames_dev, maps, scalars, alpha, valid
                )
            device_fence(sc)
            dt = (time.perf_counter() - t0) / ticks
            log({"probe": "multicam_device_tick", "mode": mode, "streams": k,
                 "device_ms_per_tick": round(dt * 1e3, 2),
                 "fps_30_capacity": bool(dt * 1e3 < 33.3),
                 "aggregate_frames_per_s": round(k / dt, 1)})
            del engine, frames_dev, maps, scalars, norm_u8, rec_u8, sc
            gc.collect()


if __name__ == "__main__":
    main()
