#!/usr/bin/env python3
"""BASELINE config #3: continual-learning stream with per-task CDF thresholds.

Drives the streaming engine over a synthetic multi-task stream (task switch =
scene change + engine.new_task()), with continual learning on and the
anomaly threshold derived from the per-task score CDF
(anomaly_score_method: cdf). Reports sustained frames/s including CL steps.
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
    parser.add_argument("--frames-per-task", type=int, default=60)
    parser.add_argument("--tasks", type=int, default=2)
    parser.add_argument("--image-size", type=int, nargs=3, default=[64, 64, 3])
    parser.add_argument("--latent", type=int, default=32)
    args = parser.parse_args()

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_config
    from trustedai_cl_vae_ad_tpu.stream.capture import SyntheticSource
    from trustedai_cl_vae_ad_tpu.stream.engine import StreamingEngine

    w, h, _c = args.image_size
    config = {
        "data": {"image_size": list(args.image_size)},
        "loss": {"kurtosis": 1.8, "w_kl_divergence": 0.0, "w_kurtosis": 1e-4, "w_mse": 1.0,
                 "w_skew": 0.0, "w_z_l1_reg": 0.0},
        "model": {"type": "KurtosisSingle", "latent_dimensions": args.latent,
                  "layers": [8, 16], "decoder_dense_filters": 8},
        "training": {"batch_size": 16, "beta": 1e-6, "learning_rate": 1e-3, "max_epochs": 1},
    }
    model = load_model_from_config(config)
    model.compile()
    settings = {
        "anomaly_score_threshold": 3.0,      # fallback until the CDF warms up
        "anomaly_score_method": "cdf",
        "cdf_quantile": 0.995,
        "buffer_record_period_s": 1.0,
        "anomalous_state_period_s": 2.0,
    }
    engine = StreamingEngine(model, config, anomaly_settings=settings)
    engine.inference_period_ms = 0.0
    engine.continuous_learning_period_ms = 0.0
    engine.enable_cont_learning = True

    n = 0
    t0 = time.perf_counter()
    for task in range(args.tasks):
        engine.new_task()
        src = SyntheticSource(width=int(1.5 * h), height=int(1.5 * w),
                              n_frames=args.frames_per_task,
                              seed=task * 7, motion=0.2 * task)
        for frame in src:
            engine.process_frame(frame)
            n += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "CL stream frames/s (train-every-frame + per-task CDF threshold)",
        "value": round(n / dt, 2),
        "unit": "frames/sec",
        "tasks": args.tasks,
        "cl_epochs": engine.cl_epochs,
        "final_cdf_threshold": (lambda t: None if t is None or not np.isfinite(t)
                        else round(float(t), 4))(engine.current_threshold()),
    }))


if __name__ == "__main__":
    main()
