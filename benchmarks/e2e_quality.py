#!/usr/bin/env python3
"""End-to-end quality check on real TPU: train the flagship, detect anomalies.

Throughput benches prove speed; this proves the framework TRAINS and the
two-pass anomaly pipeline DETECTS (the reference's end metric):

  1. synthesize a static surveillance scene (structured background + sensor
     noise) — 512 train frames at the flagship's 224x300;
  2. train KurtosisGlobalCVAE (latent 2000, bf16, adam_lean) for N epochs;
  3. pass 1: reference error distribution over the train set
     (do_anomaly_detection.py:57-79 math);
  4. pass 2: score an eval set where a subset of frames carries an injected
     anomaly blob; report the z-score separation and detection counts.

Writes benchmarks/QUALITY_r2.json. Frames stay device-resident (one upload);
run foreground from the repo root (single TPU client).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   os.environ.get("QUALITY_OUT", "QUALITY_r4.json"))

H, W = 224, 300
N_TRAIN = 512
N_EVAL = 128
N_ANOM = 16
BATCH = 256
EPOCHS = int(os.environ.get("QUALITY_EPOCHS", "30"))


def make_scene(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Static structured scene + per-frame sensor noise, uint8 HWC."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([
        120 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
        90 + 50 * np.cos(xx / 53.0 + 1.0),
        100 + 70 * np.sin((xx + yy) / 61.0),
    ], axis=-1)
    base[60:120, 40:110] = (40, 90, 160)   # "building"
    base[150:200, 180:260] = (200, 180, 60)  # "lot"
    frames = base[None] + rng.normal(0, 6.0, (n, H, W, 3)).astype(np.float32)
    return np.clip(frames, 0, 255).astype(np.uint8)


def inject_anomalies(frames: np.ndarray, rng: np.random.RandomState,
                     idxs) -> np.ndarray:
    out = frames.copy()
    for i in idxs:
        cy = rng.randint(20, H - 40)
        cx = rng.randint(20, W - 40)
        out[i, cy:cy + 28, cx:cx + 28] = rng.randint(0, 50, 3)  # dark intruder block
    return out


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _flagship_config, build_bench_step
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean

    rng = np.random.RandomState(0)
    train_u8 = make_scene(rng, N_TRAIN)
    eval_u8 = make_scene(np.random.RandomState(1), N_EVAL)
    anom_idx = sorted(rng.choice(N_EVAL, N_ANOM, replace=False).tolist())
    eval_u8 = inject_anomalies(eval_u8, np.random.RandomState(2), anom_idx)

    core = KurtosisGlobalCVAE(_flagship_config(), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)
    step_fn = build_bench_step(core, optimizer)

    train_dev = jax.device_put(train_u8)
    eval_dev = jax.device_put(eval_u8)
    mu0, sg0 = jnp.float32(0.0), jnp.float32(1.0)

    @jax.jit
    def batch_err(params, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        x_hat = core.call(params, x, training=False)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        return jnp.sum(err, axis=(1, 2))

    rngs = jax.random.split(jax.random.PRNGKey(1), EPOCHS * (N_TRAIN // BATCH))
    losses = []
    t0 = time.perf_counter()
    k = 0
    order = np.arange(N_TRAIN)
    for ep in range(EPOCHS):
        np.random.RandomState(ep).shuffle(order)
        for b in range(N_TRAIN // BATCH):
            idx = jnp.asarray(order[b * BATCH:(b + 1) * BATCH])
            xb = jnp.take(train_dev, idx, axis=0)
            params, opt_state, loss, _z = step_fn(params, opt_state, xb,
                                                  rngs[k], mu0, sg0)
            k += 1
        losses.append(float(loss))
        print(f"epoch {ep}: loss {losses[-1]:.6f}", flush=True)
    train_s = time.perf_counter() - t0

    # pass 1: reference distribution over train frames
    eps_train = np.concatenate([
        np.asarray(batch_err(params, train_dev[i:i + BATCH]))
        for i in range(0, N_TRAIN, BATCH)
    ])
    meu, sigma = float(eps_train.mean()), float(eps_train.std())

    # pass 2: z-score the eval set
    eps_eval = np.concatenate([
        np.asarray(batch_err(params, eval_dev[i:i + BATCH]))
        for i in range(0, N_EVAL, BATCH)
    ])
    z = (eps_eval - meu) / sigma
    is_anom = np.zeros(N_EVAL, bool)
    is_anom[anom_idx] = True
    det = z > 3.0
    result = {
        "epochs": EPOCHS,
        "train_seconds": round(train_s, 1),
        "frames_per_s_train": round(EPOCHS * N_TRAIN / train_s, 1),
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "z_anomalous_mean": round(float(z[is_anom].mean()), 2),
        "z_anomalous_min": round(float(z[is_anom].min()), 2),
        "z_normal_mean": round(float(z[~is_anom].mean()), 3),
        "z_normal_max": round(float(z[~is_anom].max()), 2),
        "detected": int((det & is_anom).sum()),
        "false_positives": int((det & ~is_anom).sum()),
        "n_anomalous": N_ANOM,
        "n_normal": N_EVAL - N_ANOM,
    }

    # int8 fidelity ON THE TRAINED MODEL (the r4 serving path): re-run both
    # scoring passes with the quantized forward; detection must match
    from trustedai_cl_vae_ad_tpu.ops import quant

    qparams = quant.quantize_params(core, params)

    @jax.jit
    def batch_err_q(qp, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        x_hat = quant.call_quantized(core, qp, x)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        return jnp.sum(err, axis=(1, 2))

    eps_train_q = np.concatenate([
        np.asarray(batch_err_q(qparams, train_dev[i:i + BATCH]))
        for i in range(0, N_TRAIN, BATCH)
    ])
    meu_q, sigma_q = float(eps_train_q.mean()), float(eps_train_q.std())
    eps_eval_q = np.concatenate([
        np.asarray(batch_err_q(qparams, eval_dev[i:i + BATCH]))
        for i in range(0, N_EVAL, BATCH)
    ])
    z_q = (eps_eval_q - meu_q) / sigma_q
    det_q = z_q > 3.0
    result["int8"] = {
        "eps_max_rel_dev": round(float(np.max(np.abs(eps_eval_q - eps_eval)
                                               / np.abs(eps_eval))), 5),
        "z_anomalous_mean": round(float(z_q[is_anom].mean()), 2),
        "z_normal_max": round(float(z_q[~is_anom].max()), 2),
        "detected": int((det_q & is_anom).sum()),
        "false_positives": int((det_q & ~is_anom).sum()),
        "decisions_match_float": bool((det_q == det).all()),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)
    assert losses[-1] < losses[0], "training did not reduce the loss"


if __name__ == "__main__":
    main()
