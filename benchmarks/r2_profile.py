#!/usr/bin/env python3
"""Device-time profiles: flagship train step (b512) + streaming frame path.

Captures jax.profiler traces (perfetto json) on the real chip, parses the
TPU op slices, and writes:
  * benchmarks/traces/<name>/perfetto_trace.json.gz   (raw artifact)
  * benchmarks/traces/<name>_summary.json             (per-op device time)

The stream trace answers VERDICT round-1 weak #2: separate the on-device
work per frame from the dispatch roundtrip for the <10 ms live-latency
target (reference hot path camera_streamer_qt.py:1263-1408).
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "traces")


def parse_perfetto(trace_dir):
    """Aggregate TPU-track slice durations by op name from a perfetto trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "perfetto_trace.json.gz"),
                      recursive=True)
    assert paths, f"no perfetto trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # map pid/tid -> track name to find device compute tracks
    track_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            track_names[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            track_names[(e["pid"], None)] = e["args"]["name"]

    def is_device(pid, tid):
        tn = track_names.get((pid, tid), "") or ""
        pn = track_names.get((pid, None), "") or ""
        s = (tn + " " + pn).lower()
        return ("tpu" in s or "xla" in s or "/device" in s) and "host" not in s

    per_op = {}
    total = 0.0
    spans = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if not is_device(e.get("pid"), e.get("tid")):
            continue
        dur = float(e.get("dur", 0.0))  # us
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + dur
        total += dur
        spans.append((float(e["ts"]), float(e["ts"]) + dur))
    wall = 0.0
    if spans:
        spans.sort()
        cur_s, cur_e = spans[0]
        for s, t in spans[1:]:
            if s > cur_e:
                wall += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        wall += cur_e - cur_s
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    return {
        "device_busy_us_sum": round(total, 1),
        "device_busy_us_union": round(wall, 1),
        "top_ops_us": [[k, round(v, 1)] for k, v in top],
        "tracks": sorted(set(filter(None, track_names.values()))),
    }


def profile_train_step():
    import jax
    import jax.numpy as jnp

    # build_bench_step == r2_adam_batch_sweep.build_step PLUS the shipped
    # TCVAE_COMPILER_OPTIONS default (vmem96m, +5.4% — BENCH_NOTES r10), so
    # the trace reflects the exact bench.py configuration
    from bench import _flagship_config, build_bench_step as build_step
    from trustedai_cl_vae_ad_tpu.registry import import_vae_based_on_type
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    batch = int(os.environ.get("PROFILE_BATCH", "512"))
    # PROFILE_MODEL selects the loss family (default: the headline flagship);
    # used by the r13 family comparison to locate KLGaussian's +10 ms
    model_type = os.environ.get("PROFILE_MODEL", "KurtosisGlobal")
    cfg = _flagship_config()
    cfg["model"]["type"] = model_type
    core = import_vae_based_on_type(model_type)(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_step(core, optimizer)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (batch, 224, 300, 3), np.uint8))
    mu, sigma = jnp.float32(100.0), jnp.float32(10.0)
    rngs = jax.random.split(jax.random.PRNGKey(1), 16)
    for i in range(3):
        params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[i], mu, sigma)
    float(loss)

    # PROFILE_TAG suffixes the artifact names so re-captures under different
    # compiler options don't clobber earlier evidence (e.g. "_vmem96m")
    tag = os.environ.get("PROFILE_TAG", "")
    tdir = os.path.join(TRACE_ROOT, f"train_step_b{batch}{tag}")
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        for i in range(3):
            params, opt_state, loss, z = step_fn(params, opt_state, x, rngs[3 + i], mu, sigma)
        float(loss)
    summary = parse_perfetto(tdir)
    summary["steps_traced"] = 3
    summary["batch"] = batch
    summary["compiler_options"] = os.environ.get("TCVAE_COMPILER_OPTIONS", "")
    with open(os.path.join(TRACE_ROOT, f"train_step_b{batch}{tag}_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("train step device busy per step: "
          f"{summary['device_busy_us_union'] / 3 / 1e3:.2f} ms", flush=True)


def profile_stream_frame(quantize: bool = False):
    """Flagship engine, 1080p input frame: device time for the fused
    infer+score dispatch (optionally on the int8-dense forward)."""
    import jax
    import jax.numpy as jnp

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    tag = "stream_frame_1080p_int8" if quantize else "stream_frame_1080p"
    config = _flagship_config()
    core = KurtosisGlobalCVAE(config, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = VAEModel(core)
    model.compile()
    engine = StreamingEngine(model, config, quantize=quantize)
    engine.inference_period_ms = 0.0

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (1080, 1920, 3), np.uint8) for _ in range(6)]
    lat = []
    for f in frames[:3]:
        t0 = time.perf_counter()
        engine.process_frame(f)
        lat.append((time.perf_counter() - t0) * 1e3)

    tdir = os.path.join(TRACE_ROOT, tag)
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        for f in frames[3:]:
            t0 = time.perf_counter()
            engine.process_frame(f)
            lat.append((time.perf_counter() - t0) * 1e3)
    summary = parse_perfetto(tdir)
    summary["frames_traced"] = 3
    summary["e2e_latency_ms"] = [round(v, 2) for v in lat]
    summary["device_ms_per_frame"] = round(summary["device_busy_us_union"] / 3 / 1e3, 3)
    with open(os.path.join(TRACE_ROOT, tag + "_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"stream frame: device {summary['device_ms_per_frame']} ms/frame, "
          f"e2e {lat}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("train", "both"):
        profile_train_step()
    if which in ("stream", "both"):
        profile_stream_frame()
    if which == "stream_q":
        profile_stream_frame(quantize=True)
