"""Host-side streaming pipeline: parallel decode, batching, caching, prefetch.

TPU-native replacement for the reference's tf.data chain
(raite_loader.py:40-58: from_generator -> map -> batch -> interleave/prefetch,
data_loader.py:49-53: normalize/resize maps + .cache()). The reference's
single-threaded Python generator (cv2.imread under the GIL,
raite_loader.py:129-153) is the throughput ceiling SURVEY.md section 3.1
identifies; here decode fans out over a thread pool (cv2 releases the GIL in
imread/imdecode) with a bounded reorder buffer, and batches are assembled into
contiguous numpy arrays ready for a single host->HBM transfer.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np


def decode_image_rgb(filepath: str) -> Optional[np.ndarray]:
    """Read an image file to RGB uint8 HWC: cv2 -> native loader -> PIL.

    Mirrors raite_loader.py:133-140 (cv2.imread + BGR2RGB, skip unreadable).
    The native C++ decoder (runtime_native/frame_loader.cpp) also exposes a
    batched worker-pool API (data/native.decode_batch) for multi-core hosts.
    """
    try:
        import cv2

        img = cv2.imread(filepath)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        # cv2 failing to decode is NOT the end of the chain: a 16-bit PNG or
        # CMYK JPEG that PIL handles would otherwise be silently dropped
        # from the dataset
    except ImportError:
        pass
    if filepath.lower().endswith((".png", ".jpg", ".jpeg")):
        from trustedai_cl_vae_ad_tpu.data import native

        img = native.decode_png(filepath)  # sniffs PNG/JPEG from the bytes
        if img is not None:
            return img
    from PIL import Image

    try:
        with Image.open(filepath) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


class ParallelDecodeIterable:
    """Decode a list of filepaths with a worker pool, preserving order.

    Yields (image uint8 HWC, filepath); silently skips unreadable files
    (reference behavior, raite_loader.py:132-138).
    """

    def __init__(
        self,
        filepaths: Sequence[str],
        decode_fn: Callable[[str], Optional[np.ndarray]] = decode_image_rgb,
        num_workers: int = 8,
        prefetch: int = 32,
    ):
        self.filepaths = list(filepaths)
        self.decode_fn = decode_fn
        self.num_workers = num_workers
        self.prefetch = max(prefetch, num_workers)

    def __len__(self):
        return len(self.filepaths)

    def __iter__(self) -> Iterator:
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: "queue.Queue" = queue.Queue()
            it = iter(self.filepaths)

            def submit_next() -> bool:
                try:
                    fp = next(it)
                except StopIteration:
                    return False
                pending.put((pool.submit(self.decode_fn, fp), fp))
                return True

            for _ in range(self.prefetch):
                if not submit_next():
                    break
            while not pending.empty():
                fut, fp = pending.get()
                img = fut.result()
                submit_next()
                if img is None:
                    continue
                yield img, fp


def batched(
    source: Iterable,
    batch_size: int,
    drop_remainder: bool = False,
) -> Iterator[dict]:
    """Assemble {'image': (B,H,W,C) uint8, 'filepath': [str]} batches.

    Equivalent of the reference's dict-map + .batch (raite_loader.py:47-54).
    Images within a batch must share a shape (as tf.data batch requires).
    """
    images: List[np.ndarray] = []
    paths: List[str] = []
    for img, fp in source:
        if images and img.shape != images[0].shape:
            # flush on shape change rather than erroring (ragged datasets) —
            # but honor drop_remainder: a caller that asked for uniform batch
            # shapes (jitted consumers retrace per novel size) must never see
            # a partial batch
            if not drop_remainder:
                yield {"image": np.stack(images), "filepath": paths}
            images, paths = [], []
        images.append(img)
        paths.append(fp if isinstance(fp, str) else str(fp))
        if len(images) == batch_size:
            yield {"image": np.stack(images), "filepath": paths}
            images, paths = [], []
    if images and not drop_remainder:
        yield {"image": np.stack(images), "filepath": paths}


class CachedDataset:
    """Materialize-once, iterate-many dataset of batches (tf.data .cache()).

    ``sized_source``: an object whose ``__len__`` answers the batch count in
    O(1) (e.g. raite._Stream computes it from the path list). Without it,
    ``len()`` before the first full iteration would decode the ENTIRE dataset
    synchronously just to count batches."""

    def __init__(self, factory: Callable[[], Iterable], sized_source=None):
        self._factory = factory
        self._sized_source = sized_source
        self._cache: Optional[List] = None
        self._lock = threading.Lock()

    def __iter__(self):
        if self._cache is not None:
            return iter(self._cache)
        return self._fill_iter()

    def _fill_iter(self):
        items = []
        for item in self._factory():
            items.append(item)
            yield item
        with self._lock:
            self._cache = items

    def __len__(self):
        if self._cache is not None:
            return len(self._cache)
        if self._sized_source is not None and hasattr(self._sized_source, "__len__"):
            return len(self._sized_source)
        self._cache = list(self._factory())
        return len(self._cache)


class BackgroundPrefetcher:
    """Run an iterator in a daemon thread with a bounded queue (prefetch).

    The producer polls a stop flag while the queue is full, so a consumer
    that abandons iteration early (break / GeneratorExit) releases the
    thread and its buffered (possibly device-resident) batches instead of
    leaking a permanently blocked thread.
    """

    _DONE = object()

    def __init__(self, iterable: Iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.iterable:
                    if not put(item):
                        return
            except BaseException as e:  # surfaced in consumer
                err.append(e)
            finally:
                put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()
            # drain so a producer blocked mid-put can observe the stop flag
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class MappedDataset:
    """Lazy per-batch map (tf.data .map equivalent), re-iterable."""

    def __init__(self, source: Iterable, fn: Callable):
        self.source = source
        self.fn = fn

    def __iter__(self):
        for item in self.source:
            yield self.fn(item)

    def __len__(self):
        return len(self.source)
