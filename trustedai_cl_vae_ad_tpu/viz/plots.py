"""Shared plotting/rendering helpers for the artifact-producing tools.

One home for the grid/heatmap/histogram code that the training evaluation
(reference train.py:170-193), the offline anomaly dumps
(do_anomaly_detection.py:159-188), the reconstruction dumps
(output_reconstructions.py:48-136) and the streaming recorder all need.
matplotlib is imported lazily with the agg backend (no display anywhere
these run).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    return plt


def jet_heatmap(err_u8: np.ndarray) -> np.ndarray:
    """JET colormap (RGB uint8). cv2 when present, else matplotlib jet.

    Matches the reference's cv2.COLORMAP_JET use (do_anomaly_detection.py:166,
    camera_streamer_qt.py:1418-1435).
    """
    try:
        import cv2

        bgr = cv2.applyColorMap(err_u8, cv2.COLORMAP_JET)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    except ImportError:
        import matplotlib.cm as cm

        return (cm.jet(err_u8.astype(np.float32) / 255.0)[..., :3] * 255).astype(np.uint8)


def image_grid(images: Sequence[np.ndarray], path: str, title: str, cols: int = 5) -> None:
    """Facet grid of [0,1] float images (reference train.py:170-181 plotly
    facet grids, rendered with matplotlib)."""
    plt = _plt()
    rows = int(np.ceil(len(images) / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for idx in range(rows * cols):
        ax = axes[idx // cols][idx % cols]
        ax.axis("off")
        if idx < len(images):
            img = np.clip(images[idx], 0.0, 1.0)
            ax.imshow(img if img.shape[-1] != 1 else img[..., 0])
    fig.suptitle(title)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def _capped_auto_bins(flat: np.ndarray, cap: int = 4096):
    """numpy's "auto" bin count (max of Freedman-Diaconis and Sturges),
    computed WITHOUT materializing the edges and capped at ``cap``. Passing
    the string straight to np.histogram allocates the edge array first: on
    heavy-tailed data (z-scores with near-degenerate sigma reach ~1e9 while
    the bulk IQR stays ~1) FD demands billions of bins and the allocation
    raises MemoryError at the final reporting step of a finished run."""
    finite = flat[np.isfinite(flat)]
    n = finite.size
    if n < 2:
        return 10
    lo, hi = float(finite.min()), float(finite.max())
    if hi <= lo:
        return 10
    sturges = int(np.ceil(np.log2(n))) + 1
    q75, q25 = np.percentile(finite, [75, 25])
    fd_width = 2.0 * float(q75 - q25) / n ** (1.0 / 3.0)
    fd = int(np.ceil((hi - lo) / fd_width)) if fd_width > 0 else sturges
    return max(1, min(cap, max(fd, sturges)))


def histogram(
    path: str,
    series: Mapping[str, np.ndarray],
    title: str,
    bins="auto",
    log_y: bool = False,
    density: bool = False,
    xlabel: Optional[str] = None,
    ylabel: Optional[str] = None,
    vline: Optional[float] = None,
    xlim: Optional[tuple] = None,
) -> None:
    """Overlaid histogram figure (train.py:183-193 / do_anomaly:142-156 style).

    ``bins="auto"`` is capped at 4096: numpy's Freedman-Diaconis estimator
    requests ~range/IQR bins, which on heavy-tailed data (z-scores with a
    near-degenerate sigma can reach 1e9 while the bulk IQR stays ~1) demands
    billions of bins and aborts with MemoryError at the final reporting step
    of an otherwise-finished run."""
    plt = _plt()
    fig, ax = plt.subplots(1, 1)
    alpha = 0.65 if len(series) > 1 else 1.0
    for label, values in series.items():
        flat = np.asarray(values).reshape(-1)
        b = _capped_auto_bins(flat) if bins == "auto" else bins
        ax.hist(flat, bins=b, label=label, alpha=alpha, density=density)
    if vline is not None:
        ax.axvline(vline, color="red", alpha=0.85)
    if xlim is not None:
        ax.set_xlim(*xlim)
    if log_y:
        ax.set_yscale("log")
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.grid()
    if len(series) > 1:
        ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def save_rgb(arr_u8: np.ndarray, path: str) -> None:
    """PNG write of an RGB (H,W,3) or grayscale (H,W)/(H,W,1) uint8 array.

    Single-channel models (image_size [..,..,1]) produce (H,W,1) frames and
    reconstructions; PIL cannot build an image from that shape directly, so
    a trailing 1-channel axis is squeezed to grayscale."""
    from PIL import Image

    if arr_u8.ndim == 3 and arr_u8.shape[-1] == 1:
        arr_u8 = arr_u8[..., 0]
    mode = "L" if arr_u8.ndim == 2 else "RGB"
    Image.fromarray(arr_u8, mode=mode).save(path)


def overlay_heatmap(norm_err_u8: np.ndarray, base_u8: np.ndarray) -> np.ndarray:
    """50/50 JET-heatmap blend over a base image (camera_streamer_qt.py:1420
    blends with the model-input frame; do_anomaly_detection.py:171 with the
    original). The caller picks the base."""
    heat = jet_heatmap(norm_err_u8)
    return (0.5 * heat + 0.5 * base_u8).astype(np.uint8)


__all__ = [
    "jet_heatmap",
    "image_grid",
    "histogram",
    "save_rgb",
    "overlay_heatmap",
]
