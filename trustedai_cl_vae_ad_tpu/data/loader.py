"""``load_data(config)``: dataset front-end keyed by the config's data section.

Parity with reference src/data_loader.py:22-98 — three sources:
  (a) ``dataset: raite``  -> COCO-JSON RaiteDataset (normalize + antialias
      resize + cache + image/filepath split), reference :34-65;
  (b) ``dataset_path``    -> saved dataset directory with train/ + validation/
      subdirectories, reference :67-76 (tf.data.Dataset.load equivalent);
  (c) ``dataset`` name    -> catalog datasets. TFDS is not available in this
      environment; the built-in ``synthetic`` generator covers the
      tests/bench path and anything else raises with guidance.

Returns {'train', 'val', ...} where each split yields dict batches whose
'image' is ALREADY on device: f32, [0,1], resized to config image_size — the
normalize/resize maps run on-TPU (data/ingest.py), not on host threads.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from trustedai_cl_vae_ad_tpu.data import ingest
from trustedai_cl_vae_ad_tpu.data.ingest import DeviceCacheBudget, DeviceCachedStream
from trustedai_cl_vae_ad_tpu.data.pipeline import MappedDataset
from trustedai_cl_vae_ad_tpu.data.raite import RaiteDataset
from trustedai_cl_vae_ad_tpu.data.saved_dataset import SavedDataset, is_saved_dataset


class DeviceStream:
    """Re-iterable wrapper: host batch source -> device-preprocessed batches."""

    def __init__(self, source, image_size, depth: int = 2):
        self.source = source
        self.image_size = image_size
        self.depth = depth

    def __iter__(self) -> Iterator[dict]:
        return ingest.device_prefetch(iter(self.source), self.image_size, depth=self.depth)

    def __len__(self):
        return len(self.source)


class TFDSCatalogDataset:
    """Catalog datasets via tensorflow_datasets (reference data_loader.py:79-84:
    ``tfds.load(dataset_name, split, shuffle_files=True, download=False)``).

    Examples are resized to the target image size per-example on host (the
    reference also resizes per-example before batching — catalog images vary
    in size), then batched; normalization stays on device (data/ingest.py).
    Requires tensorflow_datasets to be importable and the dataset to be
    already downloaded (download=False, as the reference).
    """

    def __init__(self, name: str, split: str, image_size, batch_size: int,
                 data_dir: Optional[str] = None):
        import tensorflow_datasets as tfds

        self.ds = tfds.load(
            name, split=split, shuffle_files=True, download=False, data_dir=data_dir
        )
        self.image_size = list(image_size)
        self.batch_size = int(batch_size)
        # sized streams power progress/epoch math everywhere else; without
        # this, len(DeviceStream) raises only on the catalog branch
        self._n = None
        try:
            self._n = int(self.ds.cardinality())  # tf.data datasets
        except Exception:
            try:
                self._n = len(self.ds)
            except Exception:
                pass
        if self._n is not None and self._n < 0:  # UNKNOWN/INFINITE cardinality
            self._n = None

    def __len__(self):
        if self._n is None:
            raise TypeError("catalog dataset size unknown (tfds cardinality unavailable)")
        return (self._n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        from PIL import Image

        h, w = self.image_size[0], self.image_size[1]
        batch = []

        def emit():
            out = {"image": np.stack(batch)}
            batch.clear()
            return out

        channels = self.image_size[2] if len(self.image_size) > 2 else 3
        it = self.ds.as_numpy_iterator() if hasattr(self.ds, "as_numpy_iterator") else iter(self.ds)
        for ex in it:
            img = ex["image"] if isinstance(ex, dict) else ex[0]
            img = np.asarray(img)
            # grayscale catalogs (e.g. mnist) arrive as (H, W, 1): PIL can't
            # resize that layout, and a 1-channel batch wouldn't match a
            # 3-channel model — normalize to 2-D first, widen after
            if img.ndim == 3 and img.shape[-1] == 1:
                img = img[..., 0]
            if img.shape[:2] != (h, w):
                img = np.asarray(
                    Image.fromarray(img).resize((w, h), Image.BILINEAR)
                )
            if img.ndim == 2:
                img = img[..., None] if channels == 1 else np.stack([img] * 3, axis=-1)
            batch.append(img.astype(np.uint8))
            if len(batch) == self.batch_size:
                yield emit()
        if batch:
            yield emit()


class SyntheticDataset:
    """Deterministic noise frames for tests/benchmarks (no tfds in env)."""

    def __init__(self, n: int, image_size, batch_size: int, seed: int = 0):
        self.n = n
        self.image_size = list(image_size)
        self.batch_size = batch_size
        self.seed = seed

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        remaining = self.n
        idx = 0
        w, h, c = self.image_size
        while remaining > 0:
            b = min(self.batch_size, remaining)
            img = rng.randint(0, 256, size=(b, w, h, c), dtype=np.uint8)
            paths = [f"synthetic://{self.seed}/{idx + i}" for i in range(b)]
            yield {"image": img, "filepath": paths}
            idx += b
            remaining -= b


def iter_images(dataset):
    """Yield image ndarrays from batches that may be dicts or tuples.

    The single definition of the batch contract (dict 'image' key / tuple
    first element / raw array) shared by the train loop and the offline
    anomaly pipeline."""
    for batch in dataset:
        if isinstance(batch, dict):
            yield batch["image"]
        elif isinstance(batch, (tuple, list)):
            yield batch[0]
        else:
            yield batch


def load_data(config: dict) -> dict:
    data_config = config["data"]
    dataset_path = data_config.get("dataset_path")
    dataset_name = data_config.get("dataset")
    train_split = data_config.get("train_split", "train")
    val_split = data_config.get("val_split", "validation")
    img_size = data_config["image_size"]
    batch_size = int(config["training"]["batch_size"])

    # data.device_cache: true -> HBM-resident dataset cache (epochs 2+ never
    # touch the host; the TPU-native upgrade of the reference's host .cache()).
    # Opt-in: it freezes the first epoch's batch order (a shuffled source is
    # NOT reshuffled between epochs) and budgets HBM next to the model state
    # (data.device_cache_max_gb, default 4).
    # one budget for the whole load_data call: train + val caches share it,
    # so the documented knob caps the COMBINED dataset footprint in HBM
    cache_budget = DeviceCacheBudget(
        int(float(data_config.get("device_cache_max_gb", 4)) * (1 << 30))
    ) if data_config.get("device_cache") else None

    def _stream(source, depth: int = 2):
        if cache_budget is not None:
            return DeviceCachedStream(source, img_size, depth=depth, budget=cache_budget)
        return DeviceStream(source, img_size, depth=depth)

    if dataset_name == "raite":
        if dataset_path is None:
            # name the missing key: os.path.exists(None) would raise an
            # unrelated TypeError instead
            raise ValueError(
                "data.dataset: raite requires data.dataset_path "
                "(the RAITE dataset root containing the split label dirs)")
        assert os.path.exists(dataset_path)
        assert os.path.isdir(dataset_path)
        print(f"Loading RAITE Dataset from: {dataset_path}")

        # The split may name the labels.json directly (reference usage) or its
        # containing directory; accept both.
        def _resolve_json(split):
            p = os.path.join(dataset_path, split)
            if os.path.isdir(p):
                p = os.path.join(p, "labels.json")
            assert os.path.exists(p), f"Split path missing: {p}"
            return p

        train_path = _resolve_json(train_split)
        test_path = _resolve_json(val_split)

        rdb = RaiteDataset(train_path, test_path, batchsize=batch_size)
        # Host RAM cache of decoded uint8 batches (tf.data .cache() parity).
        # Skipped by default when the HBM device cache is on: epochs 2+ read
        # only from device memory, so the host copy would pin a dataset-sized
        # allocation nothing reads again. data.host_cache overrides (e.g. a
        # labels-heavy analysis pass that re-iterates the host source).
        if bool(data_config.get("host_cache", cache_budget is None)):
            rdb.cache()

        train_stream = _stream(rdb.train_data)
        val_stream = _stream(rdb.test_data)
        return {
            "train": MappedDataset(train_stream, lambda b: b["image"]),
            # labels come straight from the host-side batch source — mapping
            # the device stream would upload+resize every image just to
            # discard it. NOTE: zipping 'train' with 'train_labels' BEFORE
            # the cache has filled runs two concurrent decode passes (each
            # CachedDataset iterator fills independently); consumers that
            # need image+filepath in one pass should use 'train_full'
            # (similarity_analysis.py does).
            "train_labels": MappedDataset(rdb.train_data, lambda b: b["filepath"]),
            "val": MappedDataset(val_stream, lambda b: b["image"]),
            "val_labels": MappedDataset(rdb.test_data, lambda b: b["filepath"]),
            "raite_db": rdb,
            "train_full": train_stream,
            "val_full": val_stream,
        }

    if dataset_path is not None:
        print(f"Loading dataset from: {dataset_path}")
        assert os.path.exists(dataset_path)
        assert os.path.isdir(dataset_path)
        train_dir = os.path.join(dataset_path, "train")
        val_dir = os.path.join(dataset_path, "validation")
        # Deterministic by default: the index-keyed analysis tools (anomaly
        # two-pass, reconstruction dumps, similarity) pair results with frames
        # by position across iterations. The TRAINING driver opts in
        # (train.py sets data.shuffle, mirroring the reference's
        # fit(shuffle=True) which also shuffles only in the fit path).
        shuffle = bool(data_config.get("shuffle", False))
        if is_saved_dataset(dataset_path) and not os.path.exists(train_dir):
            # single-split saved dataset: used both for training and as the
            # anomaly-eval input
            train_ds = SavedDataset(dataset_path, batch_size, shuffle=shuffle)
            val_ds: Optional[SavedDataset] = None
        else:
            train_ds = SavedDataset(train_dir, batch_size, shuffle=shuffle)
            val_ds = SavedDataset(val_dir, batch_size) if os.path.exists(val_dir) else None
        out = {"train": _stream(train_ds)}
        out["val"] = _stream(val_ds) if val_ds is not None else None
        return out

    if dataset_name == "synthetic":
        n_train = int(data_config.get("n_train", 256))
        n_val = int(data_config.get("n_val", 64))
        return {
            "train": _stream(SyntheticDataset(n_train, img_size, batch_size, seed=0)),
            "val": _stream(SyntheticDataset(n_val, img_size, batch_size, seed=1)),
        }

    if dataset_name is not None:
        # catalog branch (reference data_loader.py:79-84, config.yml ships
        # with dataset: imagenet2012): tfds when importable, clear error
        # otherwise
        try:
            import tensorflow_datasets  # noqa: F401
        except ImportError as e:
            raise ValueError(
                f"Catalog dataset {dataset_name!r} requires tensorflow_datasets, "
                f"which is not importable in this environment ({e}). Use "
                f"dataset: raite (COCO JSON), dataset_path (saved dataset "
                f"directory), or dataset: synthetic."
            ) from e
        data_dir = data_config.get("data_dir")
        train_ds = TFDSCatalogDataset(dataset_name, train_split, img_size,
                                      batch_size, data_dir=data_dir)
        val_ds = TFDSCatalogDataset(dataset_name, val_split, img_size,
                                    batch_size, data_dir=data_dir)
        return {
            "train": _stream(train_ds),
            "val": _stream(val_ds),
        }

    raise ValueError(
        "No dataset configured: set data.dataset (raite / synthetic / a tfds "
        "catalog name) or data.dataset_path (saved dataset directory)."
    )
