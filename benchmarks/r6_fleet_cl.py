#!/usr/bin/env python3
"""Fleet continual learning cost on the real chip.

Flagship model, K 1080p streams batched per tick (stream/multicam.py), with
fleet CL enabled: ONE gradient step per CL period on the union ring of the
last cl_ring_ticks ticks x K streams. Measures

  - inference-only ms/tick (the r2 multicam baseline),
  - the CL step itself (ms, batch = cl_ring_ticks * K model-res frames),
  - amortized ms/tick at a 30 fps tick cadence with the reference's 500 ms
    CL period (the shape the reference runs continuous learning at,
    camera_streamer_qt.py:1310-1345, lifted to K streams).

Usage: python benchmarks/r6_fleet_cl.py [K] [--quantize]
Appends to r6_results.jsonl.
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r6_results.jsonl")


def log_result(**kw):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print("RESULT", json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    quantize = "--quantize" in sys.argv
    tiny = "--tiny" in sys.argv  # CPU smoke of the harness flow
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 16
    ring_ticks = 4

    config = _flagship_config()
    if tiny:
        config["data"]["image_size"] = [32, 32, 3]
        config["model"].update(latent_dimensions=8, layers=[4],
                               decoder_dense_filters=4)
    core = KurtosisGlobalCVAE(config, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = VAEModel(core)
    rng = np.random.RandomState(0)

    engine = MultiCameraEngine(model, config, n_streams=k, quantize=quantize,
                               cl_ring_ticks=ring_ticks)
    frame_hw = (64, 64) if tiny else (1080, 1920)
    frames = [rng.randint(0, 255, (*frame_hw, 3), np.uint8) for _ in range(k)]

    tag = f"k{k}" + ("_tiny" if tiny else "_1080p") + ("_int8" if quantize else "")

    # -------- inference-only baseline (CL off) --------
    for _ in range(3):
        out = engine.process_frames(frames, now=0.0)
    float(np.nan_to_num(out[0].score))
    ticks = 5
    t0 = time.perf_counter()
    for _ in range(ticks):
        engine.process_frames(frames, now=0.0)
    infer_ms = 1000 * (time.perf_counter() - t0) / ticks
    log_result(name=f"fleet_cl_{tag}_infer", streams=k, quantize=quantize,
               infer_ms_per_tick=round(infer_ms, 2))

    # -------- fill the ring, compile + warm the CL step --------
    engine.enable_cont_learning = True
    now = 0.01
    for _ in range(ring_ticks):  # fill every slot, never past the period
        engine.process_frames(frames, now=now)
        now += 0.01
    t0 = time.perf_counter()
    engine._do_cl_step()  # first call: compile
    compile_s = time.perf_counter() - t0
    assert engine.cl_epochs == 1 and np.isfinite(engine.last_epoch_loss["loss"])

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        engine._do_cl_step()  # fetches the loss dict -> host sync per step
    cl_step_ms = 1000 * (time.perf_counter() - t0) / reps

    # device-only step time: back-to-back dispatches, one fence at the end
    # (the wall number above includes >=1 tunnel RTT for the loss fetch)
    from trustedai_cl_vae_ad_tpu.utils.profiling import device_fence

    weights = np.ones(ring_ticks * k, np.float32)
    import jax.numpy as _jnp

    w = _jnp.asarray(weights)
    p, s = engine.model.params, engine.model.opt_state
    device_fence(p)
    t0 = time.perf_counter()
    dev_reps = 10
    for _ in range(dev_reps):
        p, s, _loss = engine._cl_step_j(p, s, engine._cl_ring, w,
                                        engine.model._next_rng())
    device_fence(p)
    cl_step_device_ms = 1000 * (time.perf_counter() - t0) / dev_reps
    engine.model.params, engine.model.opt_state = p, s
    engine._refresh_serve_params()  # the old serve tree was donated above
    log_result(name=f"fleet_cl_{tag}_step", streams=k, quantize=quantize,
               cl_batch=ring_ticks * k, cl_step_ms=round(cl_step_ms, 2),
               cl_step_device_ms=round(cl_step_device_ms, 2),
               cl_step_compile_s=round(compile_s, 1),
               loss=engine.last_epoch_loss["loss"])

    # -------- sustained 30 fps cadence, 500 ms CL period --------
    ticks = 16
    fired0 = engine.cl_epochs
    t0 = time.perf_counter()
    for i in range(ticks):
        now += 1.0 / 30.0
        engine.process_frames(frames, now=now)
    wall = time.perf_counter() - t0
    fires = engine.cl_epochs - fired0
    log_result(
        name=f"fleet_cl_{tag}_sustained",
        streams=k, quantize=quantize, cl_batch=ring_ticks * k,
        infer_ms_per_tick=round(infer_ms, 2),
        sustained_ms_per_tick=round(1000 * wall / ticks, 2),
        cl_fires_in_sustained=fires,
        amortized_cl_ms_per_tick=round(1000 * wall / ticks - infer_ms, 2),
    )
    del engine, frames
    gc.collect()


if __name__ == "__main__":
    main()
