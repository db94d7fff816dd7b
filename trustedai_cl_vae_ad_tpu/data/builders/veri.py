"""VeRi vehicle dataset builder: image directory -> saved dataset.

Capability parity with reference build_veri_dataset.py:33-56
(image_dataset_from_directory at 224x224 -> Dataset.save train/validation).
TPU-native ingest feeds training; the BUILD resizes per image on the host in
the decode worker pool (bilinear, matching image_dataset_from_directory's
default) and lands in the npz saved-dataset format
(data/saved_dataset.py), which data/loader.py's dataset_path branch reloads.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

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
    """Decode + resize to image_size in the worker pool, yield uint8 batches.

    The resize happens per image ON THE HOST (as the reference's
    image_dataset_from_directory does): VeRi crops come in hundreds of
    distinct resolutions, so batching raw shapes would fragment into
    near-singleton batches (batched() flushes on shape change) and compile
    one device-resize program per unique (B, H, W) — a fresh jit shape costs
    90-200 s on remote-compile runtimes. Uniform host-resized images form
    full batches and a single device shape downstream.
    """
    from trustedai_cl_vae_ad_tpu.data.pipeline import decode_image_rgb

    h, w = int(image_size[0]), int(image_size[1])

    def decode_resized(path):
        img = decode_image_rgb(path)
        if img is None:
            return None
        if img.shape[:2] != (h, w):
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((w, h), Image.BILINEAR), np.uint8
            )
        return img

    paths = list_images(data_path)
    source = ParallelDecodeIterable(paths, decode_fn=decode_resized)
    for batch in batched(source, batch_size):
        yield {"image": batch["image"], "filepath": batch["filepath"]}


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
