"""Offline anomaly scoring: two-pass reference-distribution z-scoring.

Parity with reference do_anomaly_detection.py:57-196:
  * pass 1 (get_data_scale): per-frame error eps = sum_ch (x - x_hat)^2 summed
    over pixels on the TRAINING data -> mu, sigma, min, max, z_scores;
  * pass 2 (evaluate_anomalies): per-frame z = (eps - mu)/sigma on the eval
    data, per-pixel normalized error maps, anomalies = z > threshold;
  * outputs: z-score histogram figure, per-frame PNG dumps (err / JET heatmap /
    overlay / reconstruction / original) and sorted anomaly_list.csv. The
    reference hard-exits after the histogram (do_anomaly_detection.py:157),
    leaving the dumps dead code; here they are implemented as the working
    feature (SURVEY.md section 7.7), gated by ``histogram_only``.

TPU-first: the per-batch forward + error reductions are one jitted program;
only per-frame scalars (and, in pass 2, the normalized error maps destined
for PNGs) cross device->host. PNG encoding fans out over a thread pool.
"""

from __future__ import annotations

import concurrent.futures as cf
import csv
import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _score_fns(model):
    core = model.core

    @jax.jit
    def batch_err(params, x):
        x_rec = core.call(params, x, training=False)
        err = jnp.sum((x - x_rec) ** 2, axis=3)  # per-pixel, channel-summed
        err_reduced = jnp.sum(err, axis=(1, 2))  # per-frame scalar
        err_min = jnp.min(err)
        err_max = jnp.max(err)
        return err_reduced, err_min, err_max

    @jax.jit
    def batch_eval(params, x, mu, sigma, emin, emax):
        x_rec, _, _, _ = core.call_detailed(params, x, training=False)
        err = jnp.sum((x - x_rec) ** 2, axis=3)
        err_reduced = jnp.sum(err, axis=(1, 2))
        z = (err_reduced - mu) / sigma
        norm_err = (err - emin) / (emax - emin)
        return x_rec, err, z, norm_err

    return batch_err, batch_eval


def _iter_images(dataset: Iterable):
    for batch in dataset:
        if isinstance(batch, dict):
            yield batch["image"]
        elif isinstance(batch, (tuple, list)):
            yield batch[0]
        else:
            yield batch


def get_data_scale(model, config: dict, data: dict) -> dict:
    """Reference-error distribution over training data (reference :57-79)."""
    batch_err, _ = _score_fns(model)
    err_list, mins, maxs = [], [], []
    for x in _iter_images(data["train"]):
        x = jnp.asarray(x, jnp.float32)
        err_reduced, emin, emax = batch_err(model.params, x)
        err_list.append(np.asarray(err_reduced))
        mins.append(float(emin))
        maxs.append(float(emax))
    err_reduced = np.concatenate(err_list, axis=0)
    meu = float(np.mean(err_reduced))
    sigma = float(np.std(err_reduced))
    z_scores = (err_reduced - meu) / sigma if sigma > 0 else np.zeros_like(err_reduced)
    return {
        "meu": meu,
        "sigma": sigma,
        "min": float(np.min(mins)),
        "max": float(np.max(maxs)),
        "z_scores": z_scores,
    }


def evaluate_anomalies(
    model,
    config: dict,
    data: dict,
    data_scale: dict,
    anomaly_threshold: float,
    keep_maps: bool = True,
) -> dict:
    """Score the eval dataset against the training distribution (ref :82-117)."""
    _, batch_eval = _score_fns(model)
    mu = jnp.float32(data_scale["meu"])
    sigma = jnp.float32(data_scale["sigma"])
    emin = jnp.float32(data_scale["min"])
    emax = jnp.float32(data_scale["max"])

    recs, errs, zs, norms = [], [], [], []
    for x in _iter_images(data["train"]):
        x = jnp.asarray(x, jnp.float32)
        x_rec, err, z, norm_err = batch_eval(model.params, x, mu, sigma, emin, emax)
        zs.append(np.asarray(z))
        if keep_maps:
            recs.append(np.asarray(x_rec))
            errs.append(np.asarray(err))
            norms.append(np.asarray(norm_err))
    z_scores = np.concatenate(zs, axis=0)
    anomalies = z_scores > anomaly_threshold
    print(f"anomalies: {np.sum(anomalies)} / {len(anomalies)} "
          f"({np.sum(anomalies) / max(len(anomalies), 1):.4f})")
    out = {"z_scores": z_scores, "anomalies": anomalies}
    if keep_maps:
        out["rec"] = np.concatenate(recs, axis=0)
        out["errs"] = np.concatenate(errs, axis=0)
        out["norm_errs"] = np.concatenate(norms, axis=0)
    return out


def _jet_heatmap(err_u8: np.ndarray) -> np.ndarray:
    """JET colormap (RGB). cv2 when present, else matplotlib jet."""
    try:
        import cv2

        bgr = cv2.applyColorMap(err_u8, cv2.COLORMAP_JET)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    except ImportError:
        import matplotlib.cm as cm

        return (cm.jet(err_u8.astype(np.float32) / 255.0)[..., :3] * 255).astype(np.uint8)


def output_anomalies(
    evaluation_data: dict,
    anomaly_results: dict,
    data_scale: dict,
    output_path: str,
    anomaly_threshold: float,
    histogram_only: bool = False,
    num_workers: int = 8,
) -> None:
    """Histogram + per-frame artifact dumps + anomaly_list.csv (ref :121-196)."""
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    assert os.path.isdir(output_path)

    fig, ax = plt.subplots(1, 1)
    fig.suptitle("Error Z-Score Histogram (Per Frame)")
    ax.hist(data_scale["z_scores"], bins="auto", label="Still Data", alpha=0.45, density=True)
    ax.hist(anomaly_results["z_scores"], bins="auto", label="Evaluation Data", alpha=0.45, density=True)
    ax.axvline(anomaly_threshold, color="red", alpha=0.85)
    ax.set_xlim(-3.0, 70.0)
    ax.set_xlabel("Z-Score (Normal Assumption)")
    ax.set_ylabel("Density (Per Frame)")
    ax.set_yscale("log")
    ax.grid()
    ax.legend()
    plt.tight_layout()
    fig.savefig(os.path.join(output_path, "anomaly_fig.png"))
    plt.close(fig)

    if histogram_only:
        return

    dirs = {name: os.path.join(output_path, name) for name in ("err", "heatmap", "overlay", "rec", "orig")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def dump_frame(i: int, x: np.ndarray, rec: np.ndarray, norm_err: np.ndarray) -> str:
        err_u8 = np.clip(np.round(255.0 * norm_err), 0, 255).astype(np.uint8)
        heatmap = _jet_heatmap(err_u8)
        rec_u8 = np.clip(np.round(255.0 * rec), 0, 255).astype(np.uint8)
        orig_u8 = np.clip(np.round(255.0 * x), 0, 255).astype(np.uint8)
        overlay = (0.5 * heatmap + 0.5 * rec_u8).astype(np.uint8)
        basename = f"{i:06d}.png"
        Image.fromarray(err_u8, mode="L").save(os.path.join(dirs["err"], basename))
        Image.fromarray(heatmap, mode="RGB").save(os.path.join(dirs["heatmap"], basename))
        Image.fromarray(overlay, mode="RGB").save(os.path.join(dirs["overlay"], basename))
        Image.fromarray(rec_u8, mode="RGB").save(os.path.join(dirs["rec"], basename))
        orig_path = os.path.join(dirs["orig"], basename)
        Image.fromarray(orig_u8, mode="RGB").save(orig_path)
        return orig_path

    orig_paths = []
    idx = 0
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = []
        for x_batch in _iter_images(evaluation_data["train"]):
            x_batch = np.asarray(x_batch)
            for x in x_batch:
                if idx >= len(anomaly_results["z_scores"]):
                    break
                futures.append(
                    pool.submit(
                        dump_frame, idx, x,
                        anomaly_results["rec"][idx], anomaly_results["norm_errs"][idx],
                    )
                )
                idx += 1
        orig_paths = [f.result() for f in futures]

    rows = sorted(
        zip(orig_paths, anomaly_results["z_scores"][: len(orig_paths)]),
        key=lambda t: t[1],
        reverse=True,
    )
    with open(os.path.join(output_path, "anomaly_list.csv"), "w", newline="") as ofile:
        writer = csv.writer(ofile)
        writer.writerow(["orig_filepath", "z_score"])
        for row in rows:
            writer.writerow(row)
    print(f"Anomalies written out to: {output_path}")
