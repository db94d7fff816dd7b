#!/usr/bin/env python3
"""CL detection quality across task switches (BASELINE config #3).

The reference ships CDFObject as its intended per-task anomaly-threshold
mechanism but never wires it in (src/cdf_object.py, no importers). This
harness measures whether the rebuild's wiring WORKS AS INTENDED: a
continual-learning stream over N tasks (task = a different static
surveillance scene, VIRAT-style), with anomaly blobs injected at known
frames in each task, comparing

  * ``cdf``   — the engine's per-task CDF threshold (anomaly_score_method:
                cdf) with ``new_task()`` at each scene change, vs
  * ``fixed`` — the reference behavior: one fixed threshold calibrated on
                task 0 (its 99.5% score quantile), no per-task reset.

Both engines run the same frames with continual learning on and identical
model init, so their score streams differ only by the per-task reset; the
threshold policies never feed back into scoring, so per-frame firings are
evaluated directly against each engine's own online thresholds.

Reported per task: detections, false positives (split into the first
``--boundary`` frames after the scene change vs steady state), and the
active threshold trace. Writes benchmarks/QUALITY_r5.json (QUALITY_OUT to
override).

Run foreground from the repo root (single TPU client); CPU dev:
  TCVAE_PLATFORM=cpu python benchmarks/cl_quality.py --preset small
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

FPS = 30.0


def make_task_scene(task: int, h: int, w: int, n: int, noise: float,
                    anom_offsets, blob: int) -> np.ndarray:
    """Static per-task surveillance scene + sensor noise; anomaly blobs
    (dark intruder block) at the given frame offsets."""
    rng = np.random.RandomState(100 + task)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f1, f2, f3 = rng.uniform(17, 71, 3)
    base = np.stack([
        120 + 60 * np.sin(xx / f1) * np.cos(yy / f2),
        90 + 50 * np.cos(xx / f3 + task),
        100 + 70 * np.sin((xx + yy) / (f1 + f2)),
    ], axis=-1)
    # per-task "structures" at task-specific positions
    for _ in range(3):
        y0, x0 = rng.randint(0, h - h // 4), rng.randint(0, w - w // 4)
        base[y0:y0 + h // 4, x0:x0 + w // 4] = rng.randint(30, 220, 3)
    frames = base[None] + rng.normal(0, noise, (n, h, w, 3)).astype(np.float32)
    frames = np.clip(frames, 0, 255).astype(np.uint8)
    brng = np.random.RandomState(200 + task)
    for span in anom_offsets:  # each event is a SPAN of frames (an intruder
        cy = brng.randint(blob, h - 2 * blob)  # persists; reference hold-
        cx = brng.randint(blob, w - 2 * blob)  # period design :898-914)
        color = brng.randint(0, 50, 3)
        for i in span:
            frames[i, cy:cy + blob, cx:cx + blob] = color
    return frames


def build_engine(config, settings, seed=0):
    from trustedai_cl_vae_ad_tpu.models.wrapper import VAEModel
    from trustedai_cl_vae_ad_tpu.registry import build_core_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    model = VAEModel(build_core_from_config(config), seed=seed)
    model.compile()
    engine = StreamingEngine(model, config, anomaly_settings=dict(settings),
                             stream_error_ma=0.99)
    engine.inference_period_ms = 0.0
    engine.continuous_learning_period_ms = 150.0  # CL every ~5th frame @30fps
    engine.enable_cont_learning = True
    engine._last_cl_t = -1e9
    return engine


def run_stream(engine, tasks_frames, use_new_task: bool):
    """Drive all tasks through one engine on an injected 30 fps clock.
    Returns per-frame records (task, offset, score, threshold, fired)."""
    records = []
    t = 0
    for task, frames in enumerate(tasks_frames):
        if use_new_task:
            engine.new_task()
        for off in range(frames.shape[0]):
            now = t / FPS
            r = engine.process_frame(frames[off], now=now)
            thr = engine.current_threshold()
            score = r.score
            records.append({
                "task": task, "off": off,
                "score": None if np.isnan(score) else float(score),
                # +inf = the warm-up abstention (cdf_warmup_abstain): keep
                # the JSON strict-parseable (json.dumps would emit the
                # non-standard Infinity literal)
                "threshold": float(thr) if np.isfinite(thr) else None,
                "fired": bool(np.isfinite(score) and score > thr),
            })
            t += 1
    return records


def summarize(records, anom_events, boundary: int):
    """Event-level recall (an event = a multi-frame anomaly span; detected
    if ANY of its frames fires) + per-frame false positives split into the
    post-switch boundary window vs steady state."""
    out = []
    by_task = {}
    for rec in records:
        by_task.setdefault(rec["task"], []).append(rec)
    anom_frames = {i for span in anom_events for i in span}
    for task, recs in sorted(by_task.items()):
        fired_offs = {r["off"] for r in recs if r["fired"]}
        det = sum(1 for span in anom_events if any(i in fired_offs for i in span))
        fp_boundary = sum(1 for r in recs
                          if r["off"] < boundary and r["off"] not in anom_frames and r["fired"])
        fp_steady = sum(1 for r in recs
                        if r["off"] >= boundary and r["off"] not in anom_frames and r["fired"])
        thr_end = recs[-1]["threshold"]
        scores = [r["score"] for r in recs if r["score"] is not None]
        anom_scores = [r["score"] for r in recs
                       if r["score"] is not None and r["off"] in anom_frames]
        out.append({
            "task": task,
            "detected_events": det, "n_events": len(anom_events),
            "fp_boundary": fp_boundary, "fp_steady": fp_steady,
            "threshold_end": None if thr_end is None else round(thr_end, 4),
            "score_p50": round(float(np.median(scores)), 4) if scores else None,
            "score_anomalous_max": round(max(anom_scores), 4) if anom_scores else None,
            "score_max_normal": round(max(
                (r["score"] for r in recs
                 if r["score"] is not None and r["off"] not in anom_frames),
                default=float("nan")), 4),
        })
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=["small", "flagship"], default="flagship")
    parser.add_argument("--tasks", type=int, default=3)
    parser.add_argument("--frames-per-task", type=int, default=240)
    parser.add_argument("--boundary", type=int, default=40,
                        help="frames after a switch counted as boundary window")
    parser.add_argument("--blob", type=int, default=64,
                        help="anomaly blob side; default ~5%% of pixels at "
                             "224x300 (matching the small preset's relative "
                             "size — a 1%% blob is invisible to the count-"
                             "based streaming scorer)")
    parser.add_argument("--calib-quantile", type=float, default=0.995)
    parser.add_argument("--cdf-window", type=int, default=None,
                        help="override the engine's cdf_window (recent-score "
                             "window the per-task CDF reads)")
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

    n = args.frames_per_task
    # anomaly EVENTS (3-frame spans) well past the CDF warm-up (32 scores)
    # and the boundary window
    anom_events = [list(range(int(n * f), int(n * f) + 3))
                   for f in (0.5, 0.65, 0.8, 0.92)]
    blob = args.blob if args.preset == "flagship" else 16
    tasks_frames = [
        make_task_scene(t, h, w, n, noise=4.0 + 2.0 * t,
                        anom_offsets=anom_events, blob=blob)
        for t in range(args.tasks)
    ]

    # --- policy A: per-task CDF thresholds + new_task() at each switch
    cdf_settings = {
        "anomaly_score_threshold": 3.0,  # warm-up fallback
        "anomaly_score_method": "cdf",
        "cdf_quantile": args.calib_quantile,
        "cdf_warmup_skip": args.boundary,  # drop the post-switch transition storm from
        "buffer_record_period_s": 1.0,  # the per-task CDF statistics
        "anomalous_state_period_s": 2.0,
    }
    if args.cdf_window is not None:
        cdf_settings["cdf_window"] = int(args.cdf_window)
    eng_cdf = build_engine(config, cdf_settings, seed=0)
    rec_cdf = run_stream(eng_cdf, tasks_frames, use_new_task=True)
    del eng_cdf  # flagship engine ~8 GB on device (params + Adam moments)

    # --- policy B: the reference behavior — one fixed threshold calibrated
    # on task 0, no reset. Calibration pass: run task 0 with an inert
    # threshold, take its q-quantile, then rerun everything fixed.
    calib_settings = dict(cdf_settings, anomaly_score_method="fixed",
                          anomaly_score_threshold=1e9)
    eng_cal = build_engine(config, calib_settings, seed=0)
    cal = run_stream(eng_cal, tasks_frames[:1], use_new_task=False)
    del eng_cal
    anom_frames = {i for span in anom_events for i in span}
    # operator calibration: steady-state scores of task 0 (the boundary
    # window and anomaly frames excluded) — the fixed policy's best case
    cal_scores = [r["score"] for r in cal
                  if r["score"] is not None and r["off"] >= args.boundary
                  and r["off"] not in anom_frames]
    fixed_thr = float(np.quantile(cal_scores, args.calib_quantile))

    fixed_settings = dict(cdf_settings, anomaly_score_method="fixed",
                          anomaly_score_threshold=fixed_thr)
    eng_fix = build_engine(config, fixed_settings, seed=0)
    rec_fix = run_stream(eng_fix, tasks_frames, use_new_task=False)

    result = {
        "preset": args.preset,
        "tasks": args.tasks,
        "frames_per_task": n,
        "anomaly_events": anom_events,
        "boundary_window": args.boundary,
        "fixed_threshold_calibrated_on_task0": round(fixed_thr, 4),
        "cdf": summarize(rec_cdf, anom_events, args.boundary),
        "fixed": summarize(rec_fix, anom_events, args.boundary),
    }
    for policy in ("cdf", "fixed"):
        result[f"{policy}_total_detected"] = sum(
            t["detected_events"] for t in result[policy])
        result[f"{policy}_total_fp_steady"] = sum(
            t["fp_steady"] for t in result[policy])
        result[f"{policy}_total_fp_boundary"] = sum(
            t["fp_boundary"] for t in result[policy])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.environ.get("QUALITY_OUT", "QUALITY_r5.json"))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
