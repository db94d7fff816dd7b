#!/usr/bin/env python3
"""Multi-camera batched scoring throughput on the real chip.

Flagship model, 1080p uint8 frames, K streams per tick: measures wall
ms/tick for K in {1, 4, 8, 16} to show the marginal cost of widening the
dispatch across cameras (BASELINE config #5: live 1080p at 30 fps with
continuous-batched TPU inference). Appends to r2_results.jsonl.
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r2_results.jsonl")


def log_result(**kw):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print("RESULT", json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    config = _flagship_config()
    core = KurtosisGlobalCVAE(config, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = VAEModel(core)
    rng = np.random.RandomState(0)

    ks = [int(k) for k in (sys.argv[1:] or ["1", "4", "8", "16"])]
    for k in ks:
        engine = MultiCameraEngine(model, config, n_streams=k)
        frames = [rng.randint(0, 255, (1080, 1920, 3), np.uint8) for _ in range(k)]
        for _ in range(3):  # compile + warm
            out = engine.process_frames(frames)
        float(np.nan_to_num(out[0].score))
        ticks = 15
        t0 = time.perf_counter()
        for _ in range(ticks):
            out = engine.process_frames(frames)
        # process_frames already fetches score_count (host sync) per tick
        dt = time.perf_counter() - t0
        log_result(name=f"multicam_k{k}_1080p", streams=k,
                   ms_per_tick=round(1000 * dt / ticks, 2),
                   stream_fps_at_tick_rate=round(ticks / dt, 1),
                   aggregate_frames_per_s=round(k * ticks / dt, 1))
        del engine, frames
        gc.collect()


if __name__ == "__main__":
    main()
