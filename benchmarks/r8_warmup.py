"""Measure --warmup's payoff at flagship scale: frame-0 latency with the
dispatch pre-compiled vs the unwarmed baseline (75.6 s warm-cache, BENCH_NOTES
r7 "Engine int8-checkpoint boot at flagship scale").

Boots the flagship from its int8 checkpoint (the serving boot path), calls
``engine.warmup(frame_shape=(1080, 1920, 3))``, then scores one synthetic
1080p frame and reports its end-to-end wall time — which should now be the
steady-state tunnel latency (~165-200 ms), not a first-jit.

Run from the repo root, TPU idle:  python benchmarks/r8_warmup.py [--no-warmup]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model-dir", default="logs/flagship_serve_drive")
    ap.add_argument("--no-warmup", action="store_true",
                    help="control run: skip warmup, frame 0 pays the jit")
    args = ap.parse_args()

    from trustedai_cl_vae_ad_tpu.stream.engine import load_engine_from_directory

    t0 = time.perf_counter()
    engine = load_engine_from_directory(
        args.model_dir, quantize=True, int8_checkpoint_boot=True)
    engine.inference_period_ms = 0.0
    t_boot = time.perf_counter() - t0
    print(f"boot {t_boot:.1f} s", flush=True)

    t_warm = 0.0
    if not args.no_warmup:
        t0 = time.perf_counter()
        engine.warmup(frame_shape=(1080, 1920, 3))
        t_warm = time.perf_counter() - t0
        print(f"warmup {t_warm:.1f} s", flush=True)

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (1080, 1920, 3), np.uint8)
    t0 = time.perf_counter()
    res = engine.process_frame(frame)
    t_frame0 = time.perf_counter() - t0

    # steady state for reference
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        engine.process_frame(rng.randint(0, 255, (1080, 1920, 3), np.uint8))
        lat.append(time.perf_counter() - t0)

    print(json.dumps({
        "boot_s": round(t_boot, 1),
        "warmup_s": round(t_warm, 1),
        "frame0_ms": round(t_frame0 * 1e3, 1),
        "steady_p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 1),
        "score0": float(res.score),
        "warmed": not args.no_warmup,
    }))


if __name__ == "__main__":
    main()
