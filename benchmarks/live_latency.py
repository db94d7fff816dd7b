#!/usr/bin/env python3
"""BASELINE config #5: live-stream per-frame scoring latency.

Measures the streaming engine's single-dispatch infer+score path (1080p RGB
frames -> device resize -> CVAE forward -> fused EMA scorer -> score fetch)
on the flagship model. Prints a JSON line with p50/p95.

Environment note: through a tunneled TPU the dispatch-roundtrip floor alone
is ~30 ms; on a PCIe/ICI-attached chip this path is millisecond-scale.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--latent", type=int, default=2000)
    parser.add_argument("--host-resize", action="store_true")
    parser.add_argument("--pipelined", action="store_true")
    args = parser.parse_args()

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    config = {
        "data": {"image_size": [224, 300, 3]},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisGlobal", "latent_dimensions": args.latent,
                  "layers": [32, 64], "decoder_dense_filters": 32},
        "training": {"batch_size": 256, "beta": 0.98, "learning_rate": 1e-4, "max_epochs": 10},
    }
    model = load_model_from_config(config)
    model.compile()
    engine = StreamingEngine(model, config, host_resize=args.host_resize,
                             pipelined=args.pipelined)
    engine.inference_period_ms = 0.0

    frame = np.random.RandomState(0).randint(
        0, 255, (args.height, args.width, 3), np.uint8
    )
    lat = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        engine.process_frame(frame)
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat = np.array(lat[max(3, len(lat) // 8):])
    print(json.dumps({
        "metric": f"live p50 latency ms ({args.height}p -> 224x300, latent {args.latent})",
        "value": round(float(np.percentile(lat, 50)), 2),
        "p95": round(float(np.percentile(lat, 95)), 2),
        "unit": "ms",
        "vs_baseline": round(10.0 / float(np.percentile(lat, 50)), 4),
    }))


if __name__ == "__main__":
    main()
