"""COCO-JSON index: parsing, path resolution, and validation.

Parity with reference src/raite_loader.py:65-92 (JSON load, ``frames/``
sibling-directory resolution, per-image existence asserts) and
coco_validator.py:10-57 (structural invariants: required keys, bbox length 4,
area == w*h, iscrowd in {0,1}, image_id/category_id cross-references).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List


def load_coco_index(json_data_path: str) -> dict:
    """Load a COCO labels.json and resolve per-image full_filepath.

    Images live in a ``frames/`` directory next to the JSON
    (raite_loader.py:81-91). Raises on missing files, as the reference does.
    """
    assert os.path.exists(json_data_path)
    assert os.path.isfile(json_data_path)
    with open(json_data_path, "r") as ifile:
        data = json.load(ifile)
    assert data is not None

    json_dirname = os.path.abspath(os.path.dirname(json_data_path))
    img_dirname = os.path.join(json_dirname, "frames")
    assert os.path.exists(img_dirname)
    assert os.path.isdir(img_dirname)

    for row in data["images"]:
        image_filepath = os.path.join(img_dirname, row["file_name"])
        assert os.path.exists(image_filepath)
        assert os.path.isfile(image_filepath)
        row["full_filepath"] = image_filepath
    return data


def image_annotation_map(data: dict) -> Dict[int, List[int]]:
    """image_id -> [annotation indices] (raite_loader.py:121-124)."""
    out = defaultdict(list)
    for idx, annotation in enumerate(data.get("annotations", [])):
        out[annotation["image_id"]].append(idx)
    return out


def validate_coco_data(data: dict) -> None:
    """Structural validation. Parity with coco_validator.py:10-57 semantics."""
    for key in ("info", "categories", "images", "annotations"):
        assert key in data, f"COCO data missing required key: {key}"

    image_ids = set()
    for image in data["images"]:
        for key in ("id", "file_name", "width", "height"):
            assert key in image, f"COCO image missing key: {key}"
        assert image["id"] not in image_ids, f"duplicate image id: {image['id']}"
        image_ids.add(image["id"])
        assert image["width"] > 0 and image["height"] > 0

    category_ids = set()
    for category in data["categories"]:
        assert "id" in category and "name" in category
        category_ids.add(category["id"])

    ann_ids = set()
    for ann in data["annotations"]:
        for key in ("id", "image_id", "category_id", "bbox", "area", "iscrowd"):
            assert key in ann, f"COCO annotation missing key: {key}"
        assert ann["id"] not in ann_ids, f"duplicate annotation id: {ann['id']}"
        ann_ids.add(ann["id"])
        assert ann["image_id"] in image_ids, f"annotation references unknown image {ann['image_id']}"
        assert (
            ann["category_id"] in category_ids
        ), f"annotation references unknown category {ann['category_id']}"
        bbox = ann["bbox"]
        assert len(bbox) == 4, f"bbox must have length 4: {bbox}"
        w, h = bbox[2], bbox[3]
        assert abs(ann["area"] - w * h) < 1e-6, (
            f"annotation {ann['id']}: area {ann['area']} != bbox w*h {w * h}"
        )
        assert ann["iscrowd"] in (0, 1)


def new_coco_skeleton(description: str = "") -> dict:
    """Empty COCO structure for the dataset builders."""
    return {
        "info": {"description": description, "version": "1.0"},
        "licenses": [],
        "categories": [],
        "images": [],
        "annotations": [],
    }
