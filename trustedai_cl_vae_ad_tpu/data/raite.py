"""RAITE COCO dataset: index + parallel-decode batch streams.

Capability parity with reference src/raite_loader.py:29-164 (RaiteDataset):
COCO JSON parsing with ``frames/`` path resolution and existence asserts,
train/test batch streams of {'image', 'filepath'}, batch size 32 default,
and split helpers yielding image-only / filepath-only streams.

TPU-first re-architecture: instead of a GIL-bound Python generator feeding
tf.data (the reference's host hot loop, SURVEY.md section 3.1), decode fans
out over a thread pool (data/pipeline.py) and the normalize/resize work moves
on-device (data/ingest.py). The reference's range(2)-interleave trick
(raite_loader.py:57-58) is subsumed by the bounded background prefetcher.
"""

from __future__ import annotations

import time
from typing import Iterator

from trustedai_cl_vae_ad_tpu.data.coco import load_coco_index
from trustedai_cl_vae_ad_tpu.data.pipeline import (
    CachedDataset,
    MappedDataset,
    ParallelDecodeIterable,
    batched,
)


class RaiteDataset:
    def __init__(
        self,
        train_json_path: str,
        test_json_path: str,
        batchsize: int = 32,
        num_workers: int = 8,
    ):
        self.train_dict = load_coco_index(train_json_path)
        self.test_dict = load_coco_index(test_json_path)
        self.batchsize = batchsize
        self.num_workers = num_workers

        self.train_data = self._build_stream("train")
        self.test_data = self._build_stream("test")

    def filepaths(self, dataset_selection: str) -> list:
        if dataset_selection not in ("train", "test"):
            raise RuntimeError(
                f'Error, unrecognized argument: {dataset_selection} (["test", "train"])'
            )
        data_dict = self.train_dict if dataset_selection == "train" else self.test_dict
        return [row["full_filepath"] for row in data_dict["images"]]

    def _build_stream(self, selection: str):
        paths = self.filepaths(selection)
        batchsize = self.batchsize
        num_workers = self.num_workers

        class _Stream:
            def __iter__(self_inner) -> Iterator[dict]:
                source = ParallelDecodeIterable(paths, num_workers=num_workers)
                return batched(source, batchsize)

            def __len__(self_inner):
                return (len(paths) + batchsize - 1) // batchsize

        return _Stream()

    # -- split helpers (raite_loader.py:155-164) ---------------------------------
    def split_train_data_labels(self):
        return (
            MappedDataset(self.train_data, lambda b: b["image"]),
            MappedDataset(self.train_data, lambda b: b["filepath"]),
        )

    def split_test_data_labels(self):
        return (
            MappedDataset(self.test_data, lambda b: b["image"]),
            MappedDataset(self.test_data, lambda b: b["filepath"]),
        )

    def cache(self) -> None:
        """Materialize decoded batches in RAM on first pass (tf.data .cache()).

        The sized source keeps ``len()`` O(1): counting batches must not
        force a synchronous full-dataset decode before training starts."""
        self.train_data = CachedDataset(
            lambda s=self.train_data: iter(s), sized_source=self.train_data)
        self.test_data = CachedDataset(
            lambda s=self.test_data: iter(s), sized_source=self.test_data)


def benchmark_epochs(dataset, num_epochs: int = 2) -> float:
    """Epoch-walk benchmark (parity with raite_loader.py:185-223 CLI)."""
    start_time = time.perf_counter()
    n = 0
    for _ in range(num_epochs):
        for batch in dataset:
            img = batch["image"] if isinstance(batch, dict) else batch
            n += len(img)
    dt = time.perf_counter() - start_time
    print(f"Execution Time: {dt} ({n} frames, {n / dt:.1f} frames/s)")
    return dt


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("train_json_path", type=str, help="Train File Location")
    parser.add_argument("test_json_path", type=str, help="Test File Location")
    parser.add_argument(
        "--benchmark-epochs", "-e", type=int, default=2, help="Number of epochs to benchmark"
    )
    args = parser.parse_args()

    db = RaiteDataset(args.train_json_path, args.test_json_path)
    print("Training Set")
    benchmark_epochs(db.train_data, args.benchmark_epochs)
    print("Test Set")
    benchmark_epochs(db.test_data, args.benchmark_epochs)
    print("Benchmark complete")


if __name__ == "__main__":
    main()
