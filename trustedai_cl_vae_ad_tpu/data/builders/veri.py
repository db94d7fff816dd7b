"""VeRi vehicle dataset builder: image directory -> saved dataset.

Capability parity with reference build_veri_dataset.py:33-56
(image_dataset_from_directory at 224x224 -> Dataset.save train/validation).
TPU-native: decode fans out over the parallel pipeline, resize runs on device
(antialias bilinear, matching image_dataset_from_directory's default bilinear
224x224), and the result lands in the npz saved-dataset format
(data/saved_dataset.py), which data/loader.py's dataset_path branch reloads.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from trustedai_cl_vae_ad_tpu.data import ingest
from trustedai_cl_vae_ad_tpu.data.pipeline import ParallelDecodeIterable, batched
from trustedai_cl_vae_ad_tpu.data.saved_dataset import save_dataset

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".gif")


def list_images(data_path: str) -> list:
    assert os.path.exists(data_path)
    assert os.path.isdir(data_path)
    out = []
    for root, _dirs, files in os.walk(data_path):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in IMAGE_EXTS:
                out.append(os.path.join(root, f))
    return out


def resized_batches(data_path: str, image_size=(224, 224), batch_size: int = 32) -> Iterator[dict]:
    """Decode + device-resize to image_size, yield uint8 batches."""
    paths = list_images(data_path)
    source = ParallelDecodeIterable(paths)
    for batch in batched(source, batch_size):
        x = ingest.preprocess_batch(batch["image"], [image_size[0], image_size[1], 3])
        u8 = np.clip(np.round(np.asarray(x) * 255.0), 0, 255).astype(np.uint8)
        yield {"image": u8, "filepath": batch["filepath"]}


def build_veri_dataset(
    train_path: str, val_path: str, output_path: str, image_size=(224, 224), batch_size: int = 32
) -> None:
    os.makedirs(output_path)
    save_dataset(
        os.path.join(output_path, "train"), resized_batches(train_path, image_size, batch_size)
    )
    save_dataset(
        os.path.join(output_path, "validation"), resized_batches(val_path, image_size, batch_size)
    )
