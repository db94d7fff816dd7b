"""Device-side preprocessing + host->HBM double-buffered transfer.

TPU-native replacement for the reference's host-side tf.data maps
(data_loader.py:10-20: u8->f32/255 normalize and antialias bilinear resize).
Here normalization and the antialiased resize run ON DEVICE under jit
(jax.image.resize with a triangle kernel — the same algorithm as
tf.image.resize(antialias=True)), so the host only ships compact uint8
frames over PCIe and the VPU does the math. ``device_prefetch`` keeps
``depth`` batches in flight so transfer overlaps compute (double buffering).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trustedai_cl_vae_ad_tpu.data.pipeline import BackgroundPrefetcher


@functools.partial(jax.jit, static_argnums=(1,))
def _preprocess_u8(batch_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """uint8 HWC batch -> f32 [0,1] resized (antialias) on device."""
    x = batch_u8.astype(jnp.float32) / 255.0
    return _resize_f32(x, out_hw)


@functools.partial(jax.jit, static_argnums=(1,))
def _resize_f32(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Antialiased bilinear resize (tf.image.resize(antialias=True) semantics)."""
    b, h, w, c = x.shape
    if (h, w) != out_hw:
        x = jax.image.resize(
            x, (b, out_hw[0], out_hw[1], c), method="linear", antialias=True
        )
    return x


def preprocess_batch(batch_u8: np.ndarray, image_size) -> jax.Array:
    """Normalize + antialias-resize one uint8 batch on device.

    ``image_size`` is the config [W, H, C] triple; resize targets (W, H) in
    tensor axes 1, 2 — matching the reference's r_img_size usage
    (data_loader.py:32, :16-20).
    """
    out_hw = (int(image_size[0]), int(image_size[1]))
    return _preprocess_u8(jnp.asarray(batch_u8), out_hw)


def device_prefetch(
    batches: Iterable,
    image_size,
    depth: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[dict]:
    """Decode thread -> device transfer -> preprocessing, ``depth`` in flight.

    Yields dicts with 'image' already on device (f32, resized, normalized)
    and 'filepath' host-side. The background thread stays ahead of the
    consumer so host decode and PCIe transfer overlap TPU compute.
    """

    def produce():
        for batch in batches:
            img = batch["image"] if isinstance(batch, dict) else batch
            if img.dtype == np.uint8:
                x = preprocess_batch(img, image_size)
            else:  # already float [0,1] (e.g. saved datasets)
                x = _resize_f32(
                    jnp.asarray(img, jnp.float32),
                    (int(image_size[0]), int(image_size[1])),
                )
            if sharding is not None:
                x = jax.device_put(x, sharding)
            out = {"image": x}
            if isinstance(batch, dict) and "filepath" in batch:
                out["filepath"] = batch["filepath"]
            yield out

    return iter(BackgroundPrefetcher(produce(), depth=depth))
