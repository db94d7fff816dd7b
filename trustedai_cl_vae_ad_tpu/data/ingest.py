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
import threading
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


class DeviceCacheBudget:
    """Shared HBM byte budget for the device caches of ONE dataset.

    ``data.device_cache_max_gb`` documents a single dataset budget; the train
    and val streams of one ``load_data`` call share an instance so their
    combined footprint honors it (independent per-stream caps would allow 2x
    the documented HBM use). Thread-safe: cache fills run inside prefetcher
    threads.
    """

    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self._used = 0
        self._lock = threading.Lock()

    def take(self, n: int) -> bool:
        with self._lock:
            if self._used + n > self.max_bytes:
                return False
            self._used += n
            return True

    def release(self, n: int) -> None:
        with self._lock:
            self._used -= n


class DeviceCachedStream:
    """HBM-resident dataset cache: decode + upload once, train from device forever.

    TPU-native upgrade of the reference's host-side ``tf.data .cache()``
    (data_loader.py:49-53): the reference caches DECODED tensors in host RAM,
    so every epoch after the first still pays the host->device transfer. Here
    the first epoch materializes the preprocessed (f32, resized, normalized)
    batches in HBM; epochs 2+ never touch the host at all — the train step
    reads its input straight from device memory.

    Guard rails: caching stops (and the stream transparently falls back to
    the host path for the remainder + subsequent epochs) once the projected
    footprint exceeds the byte budget — a dataset that doesn't fit next to
    the model/optimizer state must stream. The decision is logged once. Pass
    a shared :class:`DeviceCacheBudget` to cap SEVERAL streams (train + val)
    jointly; ``max_bytes`` alone budgets this stream only. A cache fill that
    is abandoned mid-epoch returns its reservation; only one iterator fills
    at a time (concurrent iterations stream from the host).

    Numerics: exact — the cached arrays ARE the `device_prefetch` outputs,
    so a cached epoch is bit-identical to a streamed one.
    """

    def __init__(
        self,
        source,
        image_size,
        depth: int = 2,
        max_bytes: int = 4 << 30,
        budget: Optional[DeviceCacheBudget] = None,
    ):
        self.source = source
        self.image_size = image_size
        self.depth = depth
        self.budget = budget if budget is not None else DeviceCacheBudget(max_bytes)
        self._cache: Optional[list] = None
        self._gave_up = False
        self._filling = False
        self._lock = threading.Lock()

    def __len__(self):
        if self._cache is not None:
            return len(self._cache)
        return len(self.source)

    def __iter__(self) -> Iterator[dict]:
        with self._lock:
            if self._cache is not None:
                return iter(self._cache)
            # only ONE iteration fills (concurrent fills would transiently
            # double the HBM footprint and race on _cache); concurrent or
            # post-give-up iterations stream through the host path
            fill = not (self._gave_up or self._filling)
            if fill:
                self._filling = True
        if fill:
            return self._fill_iter()
        return device_prefetch(iter(self.source), self.image_size, depth=self.depth)

    def _fill_iter(self) -> Iterator[dict]:
        items: list = []
        used = 0
        committed = False
        stream = device_prefetch(iter(self.source), self.image_size, depth=self.depth)
        try:
            for batch in stream:
                if not self._gave_up:
                    nbytes = int(batch["image"].nbytes)
                    if self.budget.take(nbytes):
                        used += nbytes
                        items.append(batch)
                    else:
                        self._gave_up = True
                        self.budget.release(used)
                        used = 0
                        items = []  # free the device refs we were holding
                        print(
                            "DeviceCachedStream: dataset exceeds the "
                            f"{self.budget.max_bytes >> 30} GiB device-cache "
                            "budget — falling back to host streaming (set "
                            "data.device_cache_max_gb to raise the cap)."
                        )
                yield batch
            if not self._gave_up:
                self._cache = items
                committed = True  # the reservation now backs real HBM arrays
        finally:
            # abandoned mid-epoch (consumer break/exception/GC): the cache
            # never commits, so return the reserved bytes to the shared budget
            if not committed and used:
                self.budget.release(used)
            self._filling = False


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
