#!/usr/bin/env python3
"""Detection-quality run fed from DISK through the full product loader path.

The other QUALITY artifacts (QUALITY_r*.json, QUALITY_FLEET.json) score
device-resident synthetic arrays; this one closes BASELINE config #2
end-to-end: frames are PNGs on disk in a COCO-indexed RAITE layout
(<split>/labels.json + <split>/frames/, reference raite_loader.py:65-92),
loaded via config {dataset: raite} -> load_data -> data/raite.py +
data/pipeline.py parallel decode -> data/ingest.py device preprocessing
(antialias resize 448x600 -> 224x300 runs ON DEVICE) -> flagship training ->
two-pass anomaly z-scores (do_anomaly_detection.py:57-117 math).

data.device_cache keeps the multi-epoch training feasible through this
tunnel (decode+upload once); numerics are identical to streaming.

Usage:
  python benchmarks/quality_ingest.py              # flagship, TPU (~15 min)
  TCVAE_PLATFORM=cpu python benchmarks/quality_ingest.py --tiny   # CPU smoke
Writes benchmarks/QUALITY_INGEST.json. Serialize with other TPU work.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TCVAE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
)
os.environ.setdefault("TCVAE_COMPILER_OPTIONS", "xla_tpu_scoped_vmem_limit_kib=98304")

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUALITY_INGEST.json")


def make_scene(rng, n, h, w):
    """Static structured scene + per-frame sensor noise, uint8 HWC."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        120 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
        90 + 50 * np.cos(xx / 53.0 + 1.0),
        100 + 70 * np.sin((xx + yy) / 61.0),
    ], axis=-1)
    base[h // 4 : h // 2, w // 8 : w // 3] = (40, 90, 160)
    base[2 * h // 3 : 9 * h // 10, 3 * w // 5 : 7 * w // 8] = (200, 180, 60)
    frames = base[None] + rng.normal(0, 6.0, (n, h, w, 3)).astype(np.float32)
    return np.clip(frames, 0, 255).astype(np.uint8)


def inject_anomalies(frames, rng, idxs, h, w):
    blob = max(8, h // 8)
    out = frames.copy()
    for i in idxs:
        cy = rng.randint(blob, h - 2 * blob)
        cx = rng.randint(blob, w - 2 * blob)
        out[i, cy : cy + blob, cx : cx + blob] = rng.randint(0, 50, 3)
    return out


def write_split(root, split, frames):
    import cv2

    from trustedai_cl_vae_ad_tpu.data.builders.raite_json import (
        build_config_from_directory,
    )

    d = os.path.join(root, split, "frames")
    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(d, f"frame_{i:05d}.png"),
                    cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    build_config_from_directory(
        d, os.path.join(root, split, "labels.json"), force_flag=True
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke scale")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--dataset-dir", default="/tmp/tcvae_quality_ingest")
    ap.add_argument("--keep-dataset", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import _flagship_config
    from trustedai_cl_vae_ad_tpu.data.loader import load_data
    from trustedai_cl_vae_ad_tpu.models.kurtosis_global import KurtosisGlobalCVAE
    from trustedai_cl_vae_ad_tpu.ops.adam import adam_lean
    from trustedai_cl_vae_ad_tpu.utils.compile import optioned_jit

    if args.tiny:
        sh, sw, th, tw = 64, 96, 32, 48   # source -> target (device resize)
        latent, layers, ddf = 8, [4, 8], 4
        n_train, n_eval, n_anom, batch = 32, 16, 4, 8
        args.epochs = min(args.epochs, 4)
    else:
        sh, sw, th, tw = 448, 600, 224, 300
        latent, layers, ddf = 2000, [32, 64], 32
        n_train, n_eval, n_anom, batch = 512, 256, 32, 256

    # -- dataset on disk (COCO-indexed RAITE layout) --------------------------
    rng = np.random.RandomState(0)
    train_u8 = make_scene(rng, n_train, sh, sw)
    eval_u8 = make_scene(np.random.RandomState(1), n_eval, sh, sw)
    anom_idx = sorted(rng.choice(n_eval, n_anom, replace=False).tolist())
    eval_u8 = inject_anomalies(eval_u8, np.random.RandomState(2), anom_idx, sh, sw)
    t0 = time.perf_counter()
    write_split(args.dataset_dir, "train", train_u8)
    write_split(args.dataset_dir, "validation", eval_u8)
    print(f"prep: {n_train}+{n_eval} PNGs at {sw}x{sh} in "
          f"{time.perf_counter()-t0:.1f}s under {args.dataset_dir}")

    # -- product loader: COCO index -> parallel decode -> device preprocess ---
    cfg = _flagship_config(latent)
    cfg["data"].update({
        "dataset": "raite",
        "dataset_path": args.dataset_dir,
        "train_split": "train",
        "val_split": "validation",
        "image_size": [th, tw, 3],
        "device_cache": True,
        "device_cache_max_gb": 4,
    })
    cfg["model"]["layers"] = layers
    cfg["model"]["decoder_dense_filters"] = ddf
    cfg["training"]["batch_size"] = batch
    data = load_data(cfg)
    train_stream, val_stream = data["train_full"], data["val_full"]

    # -- flagship training on the stream --------------------------------------
    core = KurtosisGlobalCVAE(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = core.init(jax.random.PRNGKey(0))
    optimizer = adam_lean(1e-4)
    opt_state = optimizer.init(params)

    def step(params, opt_state, x, rng):
        def loss_fn(p):
            loss_dict = core.compute_loss(p, x, training=True, rng=rng)
            return loss_dict["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_fn = optioned_jit(step, donate_argnums=(0, 1))

    @jax.jit
    def batch_err(params, x):
        x_hat = core.call(params, x, training=False)
        err = jnp.sum((x - x_hat) ** 2, axis=3)
        return jnp.sum(err, axis=(1, 2))

    rngs = jax.random.split(jax.random.PRNGKey(1), args.epochs * max(1, len(train_stream)))
    losses = []
    k = 0
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for b in train_stream:
            params, opt_state, loss, = step_fn(params, opt_state, b["image"], rngs[k])
            k += 1
        losses.append(float(loss))  # per-epoch fence
        print(f"epoch {ep}: loss {losses[-1]:.6f}", flush=True)
    train_s = time.perf_counter() - t0

    # -- two-pass anomaly scoring through the same loader path ---------------
    eps_train = np.concatenate(
        [np.asarray(batch_err(params, b["image"])) for b in train_stream])
    meu, sigma = float(eps_train.mean()), float(eps_train.std())
    eps_eval, paths = [], []
    for b in val_stream:
        eps_eval.append(np.asarray(batch_err(params, b["image"])))
        paths.extend(b.get("filepath", []))
    eps_eval = np.concatenate(eps_eval)
    z = (eps_eval - meu) / sigma
    # positional z<->frame pairing relies on the loader yielding frames in
    # filename order (frame_{i:05d}.png == injection order) — check it, so a
    # shuffled or re-ordered loader fails loudly instead of silently scoring
    # the wrong frames as anomalous
    got_idx = [int(os.path.basename(p).rsplit("_", 1)[1].split(".")[0])
               for p in paths]
    assert got_idx == list(range(n_eval)), (
        f"loader order != injection order (got {got_idx[:5]}...)")
    is_anom = np.zeros(n_eval, bool)
    is_anom[anom_idx] = True
    det = z > 3.0

    result = {
        "provenance": "frames decoded from disk via data/raite.py COCO index + "
                      "data/pipeline.py ParallelDecodeIterable + data/ingest.py "
                      f"device resize {sw}x{sh}->{tw}x{th} (data.device_cache)",
        "preset": "tiny" if args.tiny else "flagship",
        "epochs": args.epochs,
        "train_seconds": round(train_s, 1),
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "z_anomalous_mean": round(float(z[is_anom].mean()), 2),
        "z_anomalous_min": round(float(z[is_anom].min()), 2),
        "z_normal_mean": round(float(z[~is_anom].mean()), 3),
        "z_normal_max": round(float(z[~is_anom].max()), 2),
        "detected": int((det & is_anom).sum()),
        "false_positives": int((det & ~is_anom).sum()),
        "n_anomalous": n_anom,
        "n_normal": n_eval - n_anom,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)
    assert losses[-1] < losses[0], "training did not reduce the loss"
    if not args.keep_dataset:
        shutil.rmtree(args.dataset_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
