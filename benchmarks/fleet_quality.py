#!/usr/bin/env python3
"""Fleet-CL detection quality: K cameras, ONE shared model.

The fleet-CL design trains the shared weights on the union of all streams'
frames (stream/multicam.py). The open question it must answer: does one
model adapted to K different scenes at once still detect anomalies in EACH
stream? This harness builds K static surveillance scenes (cl_quality's
VIRAT-style generator), injects intruder-blob events per stream at known
frames, drives the MultiCameraEngine with fleet CL + per-stream CDF
thresholds on an injected 30 fps clock, and reports per-stream event
recall and false positives.

Run foreground from the repo root (single TPU client); CPU dev:
  TCVAE_PLATFORM=cpu python benchmarks/fleet_quality.py --preset small
Writes benchmarks/QUALITY_FLEET.json (QUALITY_OUT to override).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cl_quality import FPS, make_task_scene, summarize  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=["small", "flagship"], default="flagship")
    parser.add_argument("--streams", type=int, default=4)
    parser.add_argument("--frames", type=int, default=240)
    parser.add_argument("--warmup-frames", type=int, default=240,
                        help="anomaly-free ticks before the scored window: "
                             "fleet CL fits the K scenes first (the analogue "
                             "of cl_quality's task>=1 rows — detection from "
                             "a converged model, not mid-cold-start); the "
                             "CDF history resets at the window boundary "
                             "(new_task, scorer EMA kept)")
    parser.add_argument("--boundary", type=int, default=40)
    parser.add_argument("--blob", type=int, default=64)
    parser.add_argument("--calib-quantile", type=float, default=0.995)
    parser.add_argument("--quantize", action="store_true")
    args = parser.parse_args()

    if args.preset == "small":
        h, w = 64, 64
        model_cfg = {"type": "KurtosisGlobal", "latent_dimensions": 32,
                     "layers": [8, 16], "decoder_dense_filters": 8}
        precision = "float32"
    else:
        h, w = 224, 300
        model_cfg = {"type": "KurtosisGlobal", "latent_dimensions": 2000,
                     "layers": [32, 64], "decoder_dense_filters": 32}
        precision = "bfloat16"
    config = {
        "data": {"image_size": [h, w, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4,
                 "w_mse": 1.0, "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": model_cfg,
        "training": {"batch_size": 16, "beta": 1e-6,
                     "learning_rate": 1e-3 if args.preset == "small" else 1e-4,
                     "max_epochs": 1, "precision": precision},
    }

    n = args.frames
    warm = args.warmup_frames
    total = warm + n
    # per-stream anomaly EVENTS (3-frame spans) inside the scored window,
    # staggered so no tick carries events in all streams at once
    events = {
        i: [list(range(warm + int(n * (f + 0.03 * i)),
                       warm + int(n * (f + 0.03 * i)) + 3))
            for f in (0.5, 0.65, 0.8)]
        for i in range(args.streams)
    }
    blob = args.blob if args.preset == "flagship" else 16
    scenes = [
        make_task_scene(i, h, w, total, noise=4.0 + 1.0 * i,
                        anom_offsets=events[i], blob=blob)
        for i in range(args.streams)
    ]
    # summarize() sees window-relative offsets
    events_rel = {i: [[f - warm for f in span] for span in events[i]]
                  for i in events}

    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.registry import build_core_from_config
    from trustedai_cl_vae_ad_tpu.stream.multicam import MultiCameraEngine

    settings = {
        "anomaly_score_threshold": 3.0,  # warm-up fallback
        "anomaly_score_method": "cdf",
        "cdf_quantile": args.calib_quantile,
        "cdf_warmup_skip": args.boundary,
        "buffer_record_period_s": 1.0,
        "anomalous_state_period_s": 2.0,
    }
    model = VAEModel(build_core_from_config(config), seed=0)
    model.compile()
    engine = MultiCameraEngine(model, config, n_streams=args.streams,
                               anomaly_settings=settings,
                               stream_error_ma=0.99,
                               quantize=args.quantize)
    engine.continuous_learning_period_ms = 150.0  # CL every ~5th tick @30fps
    engine.enable_cont_learning = True
    engine._last_cl_t = -1e9

    records = []
    for off in range(total):
        now = off / FPS
        out = engine.process_frames([scenes[i][off] for i in range(args.streams)],
                                    now=now)
        if off == warm - 1:
            # scored window starts: thresholds re-derive from warm scores
            # (scorer EMA kept — engine.new_task semantics)
            engine.new_task()
        if off < warm:
            continue
        for i, r in enumerate(out):
            thr = engine.current_threshold(i)
            score = r.score
            records.append({
                "task": i, "off": off - warm,  # summarize() groups by "task"
                "score": None if np.isnan(score) else float(score),  # = stream
                "threshold": float(thr),
                "fired": bool(np.isfinite(score) and score > thr),
            })
        if off % 60 == 0:
            print(f"tick {off}/{total}, cl_epochs={engine.cl_epochs}", flush=True)

    per_stream = []
    for i in range(args.streams):
        recs = [r for r in records if r["task"] == i]
        per_stream.append(summarize(recs, events_rel[i], args.boundary)[0])
        per_stream[-1]["stream"] = per_stream[-1].pop("task")
    result = {
        "preset": args.preset, "streams": args.streams, "frames": n,
        "warmup_frames": warm,
        "quantize": bool(args.quantize),
        "cl_epochs": engine.cl_epochs,
        "final_cl_loss": engine.last_epoch_loss["loss"],
        "per_stream": per_stream,
        "total_detected": sum(s["detected_events"] for s in per_stream),
        "total_events": sum(s["n_events"] for s in per_stream),
        "total_fp_steady": sum(s["fp_steady"] for s in per_stream),
    }
    out_path = os.environ.get(
        "QUALITY_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUALITY_FLEET.json"))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "per_stream"}))
    for s in per_stream:
        print("stream", s)


if __name__ == "__main__":
    main()
